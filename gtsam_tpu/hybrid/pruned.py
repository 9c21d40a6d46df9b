"""Pruned multi-hypothesis hybrid smoother over a sparse mode table.

Reference: gtsam/hybrid/HybridSmoother.{h,cpp} — incremental hybrid inference
where after every update the discrete mode space is pruned to the top-K leaves
(HybridBayesNet::prune), so the hypothesis count stays bounded as the
trajectory grows.  The reference stores the pruned posterior in a
DecisionTree; here the surviving assignments live in a sparse TableFactor
(discrete/table.py), which scales to dozens+ of discrete variables — the
dense-enumeration smoother (hybrid/elimination.py HybridSmoother) is exact but
exponential and caps at ~a dozen binary modes.

Per update: the K surviving joint assignments fan out over the new slice's
mode keys (K * prod(new cards) candidates), each candidate's continuous system
is solved once (linear(ized) evidence: chi2_min + log-det, the same constant
bookkeeping as HybridGaussianFactorGraph.cpp:357), and the posterior is pruned
back to K.  This is assumed-density filtering over modes — exactly the
approximation the reference's prune() commits to.
"""

import dataclasses
import itertools
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..discrete.table import TableFactor
from ..graph.values import Values
from ..optimize import optimizers as opt_mod


class PrunedHybridSmoother:
    def __init__(self, max_hypotheses: int = 16,
                 params: Optional[opt_mod.LMParams] = None):
        self.max_hypotheses = max_hypotheses
        self.params = params or opt_mod.LMParams(max_iterations=3)
        self.hfg = None                       # running HybridFactorGraph
        self.modes: Optional[TableFactor] = None   # sparse posterior P(M | z)
        self._keys: List[int] = []
        self._cards: List[int] = []
        self._contrib_cache: Dict[int, tuple] = {}
        # per-hypothesis prefix message: assignment-tuple ->
        # (sep spans [(key, dim)], H, g, c, eliminated-key set).  The prefix
        # evidence chain log p(z_1:t | M) is advanced one slice at a time by
        # Schur-complementing out variables that left the interface — per
        # update cost is O(K * (sep+slice)^3), not O(K * D^3) over the whole
        # trajectory (the round-2 advisor finding).
        self._msgs: Dict[tuple, tuple] = {}

    def _candidates(self, new_keys: List[int], new_cards: List[int]):
        """Surviving assignments x new mode keys."""
        if self.modes is None or self.modes.size == 0:
            base = [dict()]
        else:
            rows = self.modes.decode(self.modes.codes)
            base = [dict(zip(self.modes.keys, r)) for r in rows]
        out = []
        for b in base:
            for combo in itertools.product(*[range(c) for c in new_cards]):
                a = dict(b)
                a.update(zip(new_keys, combo))
                out.append(a)
        return out

    def update(self, hfg_slice, values: Values) -> Dict[int, int]:
        """Absorb one slice; returns the current MPE mode assignment."""
        from .hybrid import HybridFactorGraph
        if self.hfg is None:
            self.hfg = HybridFactorGraph()
        self.hfg.continuous += hfg_slice.continuous
        self.hfg.mixtures += hfg_slice.mixtures
        self.hfg.discrete += hfg_slice.discrete

        new_keys, new_cards = [], []
        for m in hfg_slice.mixtures:
            if m.discrete_key not in self._keys:
                new_keys.append(m.discrete_key)
                new_cards.append(m.cardinality)
        for f in hfg_slice.discrete:
            for k, c in zip(f.keys, f.cards):
                if k not in self._keys and k not in new_keys:
                    new_keys.append(k)
                    new_cards.append(c)
        self._keys += new_keys
        self._cards += new_cards

        if not self._keys:       # no modes yet: absorb into the root message
            self._root_slice(hfg_slice, values)
            return {}
        prev_keys = [k for k in self._keys if k not in new_keys]
        cands = self._candidates(new_keys, new_cards)
        lps = np.empty(len(cands))
        new_msgs: Dict[tuple, tuple] = {}
        for i, a in enumerate(cands):
            pkey = tuple(sorted((k, a[k]) for k in prev_keys))
            msg = self._msgs.get(pkey, self._empty_msg())
            lp, msg_out, ok = self._advance(msg, hfg_slice, a, values)
            if not ok:       # slice touched an already-eliminated variable
                lp = self._evidence(a, values)
                msg_out = None
            lps[i] = lp
            new_msgs[tuple(sorted(a.items()))] = msg_out

        p = np.exp(lps - lps.max())
        p /= p.sum()
        rows = np.asarray([[a[k] for k in self._keys] for a in cands],
                          dtype=np.int64).reshape(len(cands), len(self._keys))
        tf = TableFactor.from_entries(tuple(self._keys), tuple(self._cards),
                                      rows, p)
        self.modes = tf.prune(max_entries=self.max_hypotheses).normalized()
        # keep messages only for the survivors
        surv = self.modes.decode(self.modes.codes)
        self._msgs = {}
        for r in surv:
            k = tuple(sorted(zip(self.modes.keys, (int(x) for x in r))))
            if new_msgs.get(k) is not None:
                self._msgs[k] = new_msgs[k]
        return self.mpe()

    # -- incremental prefix-evidence machinery -------------------------------

    def _empty_msg(self):
        return ([], np.zeros((0, 0)), np.zeros(0), 0.0, set())

    def _root_slice(self, hfg_slice, values):
        """Mode-free slice before any discrete key exists: fold it into the
        (single) root message shared by all future hypotheses."""
        msg = self._msgs.get((), self._empty_msg())
        _, msg_out, ok = self._advance(msg, hfg_slice, {}, values)
        if ok and msg_out is not None:
            self._msgs[()] = msg_out

    def _advance(self, msg, hfg_slice, a, values):
        """(lp, new_msg, ok): advance one hypothesis's prefix message over
        the slice chosen by assignment `a`.  Exact (Gaussian evidence chain
        factorization); ok=False when the slice references a variable already
        Schur-eliminated from the interface (caller falls back to the full
        assembly)."""
        sep, Hm, gm, cm, elim = msg
        batches = list(hfg_slice.continuous)
        for m in hfg_slice.mixtures:
            batches.append(m.components[a[m.discrete_key]])
        contribs = [self._batch_contrib(b, values) for b in batches]
        kdims: Dict[int, int] = {}
        for spans, *_ in contribs:
            for k, _, dd in spans:
                kdims[k] = dd
        if any(k in elim for k in kdims):
            return 0.0, None, False
        slice_vars = set(kdims)
        for k, dd in sep:
            kdims.setdefault(k, dd)
        keys = sorted(kdims)
        offs: Dict[int, int] = {}
        pos = 0
        for k in keys:
            offs[k] = pos
            pos += kdims[k]
        D = pos
        H = np.zeros((D, D))
        gv = np.zeros(D)
        c = cm
        # prefix message
        if sep:
            sel = np.concatenate([np.arange(offs[k], offs[k] + dd)
                                  for k, dd in sep])
            H[np.ix_(sel, sel)] += Hm
            gv[sel] += gm
        for spans, Hb, gb, err, lc in contribs:
            sel = np.empty(Hb.shape[0], dtype=np.int64)
            for k, o, dd in spans:
                sel[o:o + dd] = np.arange(offs[k], offs[k] + dd)
            H[np.ix_(sel, sel)] += Hb
            gv[sel] += gb
            c += lc - err
        for f in hfg_slice.discrete:
            if all(k in a for k in f.keys):
                c += math.log(max(f.value(a), 1e-300))
        # eliminate interface vars the slice no longer references
        keep = [k for k in keys if k in slice_vars]
        drop = [k for k in keys if k not in slice_vars]
        if drop:
            di = np.concatenate([np.arange(offs[k], offs[k] + kdims[k])
                                 for k in drop])
            ki = np.concatenate([np.arange(offs[k], offs[k] + kdims[k])
                                 for k in keep]) if keep else \
                np.zeros(0, dtype=np.int64)
            Hee = H[np.ix_(di, di)]
            sign, ld = np.linalg.slogdet(Hee)
            if sign <= 0:
                return 0.0, None, False
            Hee_inv_ge = np.linalg.solve(Hee, gv[di])
            c += (0.5 * len(di) * math.log(2 * math.pi) - 0.5 * ld
                  + 0.5 * float(gv[di] @ Hee_inv_ge))
            if len(ki):
                Hke = H[np.ix_(ki, di)]
                Hn = H[np.ix_(ki, ki)] - Hke @ np.linalg.solve(Hee, Hke.T)
                gn = gv[ki] - Hke @ Hee_inv_ge
            else:
                Hn = np.zeros((0, 0))
                gn = np.zeros(0)
        else:
            ki = np.arange(D)
            Hn = H
            gn = gv
        # evidence of the whole prefix (integrate the remaining interface)
        if Hn.shape[0]:
            sign, ld = np.linalg.slogdet(Hn)
            if sign <= 0:
                return 0.0, None, False
            lp = (c + 0.5 * Hn.shape[0] * math.log(2 * math.pi) - 0.5 * ld
                  + 0.5 * float(gn @ np.linalg.solve(Hn, gn)))
        else:
            lp = c
        new_sep = [(k, kdims[k]) for k in keep]
        new_elim = set(elim) | set(drop)
        return lp, (new_sep, Hn, gn, c, new_elim), True

    def _batch_contrib(self, batch, values: Values):
        """Dense (keys, H, g, err, logc) of ONE batch at the shared
        linearization point — computed once and cached (all candidate
        assignments and later updates reuse it)."""
        key = id(batch)
        hit = self._contrib_cache.get(key)
        if hit is not None:
            return hit
        from ..graph.graph import FactorGraph
        from .elimination import _noise_log_constant
        g = FactorGraph([batch])
        ks = sorted(g.keys())
        vals_g = values.subset(ks)
        bound = g.bind(vals_g)
        H, gv = bound.gn_system(vals_g.arrays)
        err = float(bound.error(vals_g.arrays))
        lay = vals_g.layout()
        spans = []       # (key, offset, dim) in this local layout
        for k in ks:
            t = vals_g.type_of(k)
            off = int(lay.offsets[t][vals_g.row_of(k)])
            from ..graph import manifolds
            spans.append((k, off, manifolds.get(t).dim))
        lc = _noise_log_constant(batch.noise, batch.rdim)
        logc = float(lc.sum()) if lc.shape[0] > 1 \
            else float(lc[0]) * batch.num_factors
        out = (spans, np.asarray(H, np.float64), np.asarray(gv, np.float64),
               err, logc)
        self._contrib_cache[key] = out
        return out

    def _evidence(self, a: Dict[int, int], values: Values) -> float:
        """log p(z | M=a) at the given linearization point.

        Exact for linear(ized) slices: half-chi2 at the Gauss-Newton minimum
        is err(x0) - 0.5 g'H^-1 g, and the Gaussian integral contributes
        0.5 D log 2pi - 0.5 log det H plus the noise-model log-normalizers —
        the same bookkeeping as HybridGaussianFactorGraph.cpp:357 (but
        assembled from cached per-batch blocks, not an inner optimizer)."""
        batches = list(self.hfg.continuous)
        for m in self.hfg.mixtures:
            batches.append(m.components[a[m.discrete_key]])
        contribs = [self._batch_contrib(b, values) for b in batches]
        # global offset map over involved keys
        kdims: Dict[int, int] = {}
        for spans, *_ in contribs:
            for k, _, d in spans:
                kdims[k] = d
        keys = sorted(kdims)
        offs: Dict[int, int] = {}
        pos = 0
        for k in keys:
            offs[k] = pos
            pos += kdims[k]
        D = pos
        H = np.zeros((D, D))
        gv = np.zeros(D)
        err0 = 0.0
        logc = 0.0
        for spans, Hb, gb, err, lc in contribs:
            # map each local-layout span to its global offset
            sel = np.empty(Hb.shape[0], dtype=np.int64)
            for k, o, d in spans:
                sel[o:o + d] = np.arange(offs[k], offs[k] + d)
            H[np.ix_(sel, sel)] += Hb
            gv[sel] += gb
            err0 += err
            logc += lc
        sign, logdet = np.linalg.slogdet(H)
        err_min = err0 - 0.5 * float(gv @ np.linalg.solve(H, gv))
        lp = logc - err_min + 0.5 * D * math.log(2 * math.pi) \
            - 0.5 * float(logdet)
        for f in self.hfg.discrete:
            if all(k in a for k in f.keys):
                lp += math.log(max(f.value(a), 1e-300))
        return lp

    def mpe(self) -> Dict[int, int]:
        i = int(np.argmax(self.modes.vals))
        row = self.modes.decode(self.modes.codes[i:i + 1])[0]
        return dict(zip(self.modes.keys, row))

    def posterior(self) -> TableFactor:
        return self.modes

    def optimize(self, values: Values):
        """Continuous MPE solution under the current mode MPE."""
        a = self.mpe()
        g = self.hfg.graph_for(a)
        res = opt_mod.levenberg_marquardt(g, values.subset(g.keys()),
                                          self.params)
        return res.values, a
