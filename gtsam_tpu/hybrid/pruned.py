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

        if not self._keys:       # no modes yet: nothing to hypothesize over
            return {}
        cands = self._candidates(new_keys, new_cards)
        lps = np.empty(len(cands))
        for i, a in enumerate(cands):
            lps[i] = self._evidence(a, values)

        p = np.exp(lps - lps.max())
        p /= p.sum()
        rows = np.asarray([[a[k] for k in self._keys] for a in cands],
                          dtype=np.int64).reshape(len(cands), len(self._keys))
        tf = TableFactor.from_entries(tuple(self._keys), tuple(self._cards),
                                      rows, p)
        self.modes = tf.prune(max_entries=self.max_hypotheses).normalized()
        return self.mpe()

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
