"""Supernodal sparse block Cholesky: batched dense fronts per tree level.

TPU-native replacement for the reference's multifrontal elimination
(GaussianJunctionTree -> per-clique EliminatePreferCholesky under a TBB task
tree, gtsam/inference/ClusterTree-inst.h:285,
gtsam/base/treeTraversal/parallelTraversalTasks.h:43).  The symbolic phase
(inference/supernodes.py) amalgamates columns into supernodes and levels the
assembly tree; here each level runs as a handful of fixed-shape batched ops:

  gather fronts -> batched Cholesky -> batched triangular panel solve ->
  one batched Schur matmul (MXU) -> sorted segment-sum scatter of updates

so a sphere2500-class factorization is ~8 levels x ~7 ops instead of
hundreds of tiny per-variable steps.  All scatters use pre-sorted unique
targets (duplicate-index scatters serialize on TPU).
"""

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..base import reductions
from ..base import twofloat as tf
from ..graph import manifolds
from ..graph.graph import BoundGraph
from ..inference import ordering as ordering_mod
from ..inference import supernodes as sn_mod
from .exceptions import IndeterminantLinearSystemError


@dataclasses.dataclass
class _LevelPlan:
    snodes: np.ndarray
    S: int
    W: int                      # max snode width (blocks) this level
    R: int                      # max row-structure size (blocks)
    diag_ids: np.ndarray        # (S, W, W) block ids (sentinel B)
    diag_flip: np.ndarray       # (S, W, W) bool
    diag_pad: np.ndarray        # (S, W*d) 1.0 where padded col slot
    valid_diag: np.ndarray      # (S, W*d) bool: true (unpadded) pivots
    col_vars: np.ndarray        # (S, W) permuted col ids (sentinel n)
    panel_ids: Optional[np.ndarray]   # (S, R, W) block ids (sentinel B)
    row_vars: Optional[np.ndarray]    # (S, R) permuted row ids (sentinel n)
    diag_sc_src: np.ndarray     # scatter L_diag: flat src into (S*W*W)
    diag_sc_tgt: np.ndarray
    panel_sc_src: Optional[np.ndarray]
    panel_sc_tgt: Optional[np.ndarray]
    schur_src: Optional[np.ndarray]   # sorted by target: flat into (S*R*R)
    schur_seg: Optional[np.ndarray]
    schur_tgt: Optional[np.ndarray]   # unique target block ids
    fwd_src: Optional[np.ndarray]     # sorted flat into (S*R)
    fwd_seg: Optional[np.ndarray]
    fwd_tgt: Optional[np.ndarray]     # unique row var ids
    x_sc_src: np.ndarray        # flat into (S*W)
    x_sc_tgt: np.ndarray        # col var ids (unique by construction)


def _sorted_segments(tgt: np.ndarray):
    """Host: sort targets, return (order, segment_ids, unique_targets)."""
    order = np.argsort(tgt, kind="stable")
    st = tgt[order]
    if len(st) == 0:
        return order, np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int32)
    new = np.concatenate([[True], st[1:] != st[:-1]])
    seg = np.cumsum(new) - 1
    return (order.astype(np.int32), seg.astype(np.int32),
            st[new].astype(np.int32))


class SupernodalCholeskySolver:
    """Drop-in sparse solver: system / factorize / solve_factored / solve.

    Built once per (graph structure, values structure); all methods jit-safe.
    """

    @staticmethod
    def _level_cost(sym, level_overhead_flops: float = 2e6):
        """Device cost model of a supernodal schedule: padded dense-front
        flops per level plus a fixed per-level dispatch/latency charge."""
        total = 0.0
        for sids in sym.levels:
            widths = sym.snode_width[sids]
            rs = np.asarray([len(sym.snode_rows[s]) for s in sids])
            W = int(widths.max())
            R = int(rs.max()) if len(rs) else 0
            F = W + R
            total += len(sids) * (float(F) ** 2) * W + level_overhead_flops
        return total

    def __init__(self, bound: BoundGraph, order: str = "auto",
                 relax_tau: float = 0.3, force_width: int = 16,
                 max_width: int = 64):
        layout = bound.layout
        self.layout = layout
        self.var_dims = []
        self.var_offsets = []
        var_id = {}
        for t in layout.type_order:
            d = manifolds.get(t).dim
            for r in range(len(layout.offsets[t])):
                var_id[(t, r)] = len(self.var_dims)
                self.var_dims.append(d)
                self.var_offsets.append(int(layout.offsets[t][r]))
        self.nvars = len(self.var_dims)
        self.var_dims = np.asarray(self.var_dims)
        self.var_offsets = np.asarray(self.var_offsets)
        self.d = int(self.var_dims.max()) if self.nvars else 0

        self.batch_var_ids = []
        factor_keys = []
        for b, st in zip(bound.graph.batches, bound.structures):
            ids = np.stack([
                np.asarray([var_id[(t, int(r))] for r in st.rows[s]])
                for s, t in enumerate(b.var_types)], axis=1)
            self.batch_var_ids.append(ids)
            factor_keys.append(ids)

        adj = ordering_mod.adjacency_from_factors(factor_keys, self.nvars)
        kw = dict(relax_tau=relax_tau, force_width=force_width,
                  max_width=max_width)
        if order == "natural":
            sym = sn_mod.analyze_supernodal(
                adj, ordering_mod.natural(self.nvars), **kw)
        elif order == "amd":
            sym = sn_mod.analyze_supernodal(
                adj, ordering_mod.minimum_degree(adj), **kw)
        elif order == "nd":
            sym = sn_mod.analyze_supernodal(
                adj, ordering_mod.nested_dissection(adj), **kw)
        else:
            # auto: analyze both AMD and nested dissection, pick by a device
            # cost model (padded level flops + per-level dispatch overhead —
            # levels are sequential on TPU, so tree depth is a first-class
            # cost, not just fill; reference picks COLAMD vs METIS statically,
            # Ordering.h:41)
            cands = []
            for nm, p in (
                    ("amd", ordering_mod.minimum_degree(adj)),
                    ("nd", ordering_mod.nested_dissection(adj,
                                                          method="native")),
                    ("nd-bfs", ordering_mod.nested_dissection(adj,
                                                              method="bfs"))):
                s = sn_mod.analyze_supernodal(adj, p, **kw)
                cands.append((self._level_cost(s), nm, s))
            cands.sort(key=lambda t: t[0])
            sym = cands[0][2]
            self.chosen_order = cands[0][1]
        self.sym = sym
        n, d = self.nvars, self.d
        B = sym.nnz_blocks
        self.B = B

        # -- per-level plans -------------------------------------------------
        self.level_plans: List[_LevelPlan] = []
        for sids in sym.levels:
            S = len(sids)
            widths = sym.snode_width[sids]
            rsizes = np.asarray([len(sym.snode_rows[s]) for s in sids])
            W = int(widths.max())
            R = int(rsizes.max()) if len(rsizes) else 0
            diag_ids = np.full((S, W, W), B, dtype=np.int32)
            diag_flip = np.zeros((S, W, W), dtype=bool)
            col_vars = np.full((S, W), n, dtype=np.int32)
            dsc_src, dsc_tgt = [], []
            xs_src, xs_tgt = [], []
            for si, s in enumerate(sids):
                c0, w = int(sym.snode_start[s]), int(sym.snode_width[s])
                col_vars[si, :w] = np.arange(c0, c0 + w)
                for a in range(w):
                    xs_src.append(si * W + a)
                    xs_tgt.append(c0 + a)
                    for b in range(w):
                        if a >= b:
                            diag_ids[si, a, b] = sym.block_of[(c0 + a, c0 + b)]
                            dsc_src.append(si * W * W + a * W + b)
                            dsc_tgt.append(sym.block_of[(c0 + a, c0 + b)])
                        else:
                            diag_ids[si, a, b] = sym.block_of[(c0 + b, c0 + a)]
                            diag_flip[si, a, b] = True
            pad_cols = (np.arange(W)[None, :] >= widths[:, None])  # (S, W)
            diag_pad = np.repeat(pad_cols, d, axis=1).astype(np.float64)
            # valid pivots: unpadded col slot AND true manifold dim
            vd = np.zeros((S, W * d), dtype=bool)
            for si, s in enumerate(sids):
                c0, w = int(sym.snode_start[s]), int(sym.snode_width[s])
                for a in range(w):
                    dim = self.var_dims[sym.perm[c0 + a]]
                    vd[si, a * d:a * d + dim] = True
            panel_ids = row_vars = None
            psc_src = psc_tgt = None
            schur = fwd = None
            if R > 0:
                panel_ids = np.full((S, R, W), B, dtype=np.int32)
                row_vars = np.full((S, R), n, dtype=np.int32)
                psc_src, psc_tgt = [], []
                sc_src, sc_tgt = [], []
                fw_src, fw_tgt = [], []
                for si, s in enumerate(sids):
                    c0, w = int(sym.snode_start[s]), int(sym.snode_width[s])
                    rows = sym.snode_rows[s]
                    row_vars[si, :len(rows)] = rows
                    for a, ra in enumerate(rows):
                        fw_src.append(si * R + a)
                        fw_tgt.append(int(ra))
                        for b in range(w):
                            bid = sym.block_of[(int(ra), c0 + b)]
                            panel_ids[si, a, b] = bid
                            psc_src.append(si * R * W + a * W + b)
                            psc_tgt.append(bid)
                        for b in range(a + 1):
                            sc_src.append(si * R * R + a * R + b)
                            sc_tgt.append(sym.block_of[(int(ra),
                                                        int(rows[b]))])
                sc_src = np.asarray(sc_src, dtype=np.int32)
                sc_tgt = np.asarray(sc_tgt, dtype=np.int32)
                so, seg, uniq = _sorted_segments(sc_tgt)
                schur = (sc_src[so], seg, uniq)
                fw_src = np.asarray(fw_src, dtype=np.int32)
                fw_tgt = np.asarray(fw_tgt, dtype=np.int32)
                fo, fseg, funiq = _sorted_segments(fw_tgt)
                fwd = (fw_src[fo], fseg, funiq)
                psc_src = np.asarray(psc_src, dtype=np.int32)
                psc_tgt = np.asarray(psc_tgt, dtype=np.int32)
            self.level_plans.append(_LevelPlan(
                snodes=sids, S=S, W=W, R=R,
                diag_ids=diag_ids, diag_flip=diag_flip, diag_pad=diag_pad,
                valid_diag=vd, col_vars=col_vars,
                panel_ids=panel_ids, row_vars=row_vars,
                diag_sc_src=np.asarray(dsc_src, dtype=np.int32),
                diag_sc_tgt=np.asarray(dsc_tgt, dtype=np.int32),
                panel_sc_src=psc_src, panel_sc_tgt=psc_tgt,
                schur_src=None if schur is None else schur[0],
                schur_seg=None if schur is None else schur[1],
                schur_tgt=None if schur is None else schur[2],
                fwd_src=None if fwd is None else fwd[0],
                fwd_seg=None if fwd is None else fwd[1],
                fwd_tgt=None if fwd is None else fwd[2],
                x_sc_src=np.asarray(xs_src, dtype=np.int32),
                x_sc_tgt=np.asarray(xs_tgt, dtype=np.int32),
            ))

        # -- assembly plan: ONE sorted segment-sum over all contributions ----
        # Per (batch, slot-pair): target block ids; concatenated and sorted so
        # the whole H assembly is one segment_sum + one unique-index scatter.
        asm_tgt, self._asm_plan = [], []
        pos = 0
        for bt, ids in zip(bound.graph.batches, self.batch_var_ids):
            arity = ids.shape[1]
            for s1 in range(arity):
                for s2 in range(s1, arity):
                    ni = sym.inv_perm[ids[:, s1]]
                    nj = sym.inv_perm[ids[:, s2]]
                    flip = ni < nj
                    hi = np.maximum(ni, nj)
                    lo = np.minimum(ni, nj)
                    bids = np.asarray(
                        [sym.block_of[(int(h), int(l))]
                         for h, l in zip(hi, lo)], dtype=np.int32)
                    self._asm_plan.append((s1, s2, flip, pos))
                    asm_tgt.append(bids)
                    pos += len(bids)
        if asm_tgt:
            asm_tgt = np.concatenate(asm_tgt)
            ao, aseg, auniq = _sorted_segments(asm_tgt)
            self._asm_order, self._asm_seg, self._asm_uniq = ao, aseg, auniq
        else:
            self._asm_order = self._asm_seg = self._asm_uniq = (
                np.zeros(0, dtype=np.int32))
        # gradient assembly: same trick over (batch, slot) -> var targets
        g_tgt = []
        for bt, ids in zip(bound.graph.batches, self.batch_var_ids):
            for s in range(ids.shape[1]):
                g_tgt.append(sym.inv_perm[ids[:, s]].astype(np.int32))
        if g_tgt:
            g_tgt = np.concatenate(g_tgt)
            go, gseg, guniq = _sorted_segments(g_tgt)
            self._g_order, self._g_seg, self._g_uniq = go, gseg, guniq
        else:
            self._g_order = self._g_seg = self._g_uniq = (
                np.zeros(0, dtype=np.int32))

        # identity on padding diagonal (true dims < d), by NEW col id
        self.pad_diag = np.zeros((self.nvars, self.d))
        for v in range(self.nvars):
            nv = sym.inv_perm[v]
            self.pad_diag[nv, self.var_dims[v]:] = 1.0
        self.bound = bound

        # block-sparse symmetric matvec plan (iterative refinement residual):
        # y[r] += B_k x[c] for every stored lower block, y[c] += B_k^T x[r]
        # for off-diagonal blocks — both as sorted segment-sums
        br, bc = sym.block_row, sym.block_col
        ro, rseg, runiq = _sorted_segments(br)
        offd = np.where(br != bc)[0].astype(np.int32)
        co, cseg, cuniq = _sorted_segments(bc[offd])
        self._mv_plan = (ro, rseg, runiq, offd, offd[co], cseg, cuniq)

        # pow2-padded plans for the TWO-FLOAT refinement matvec (compensated
        # segment sums can't ride jax.ops.segment_sum; see base/reductions)
        def _runs(order, seg, uniq, nrows):
            counts = np.bincount(seg) if len(seg) else np.zeros(0, np.int64)
            first = np.concatenate([[0], np.cumsum(counts)[:-1]]) \
                if len(counts) else np.zeros(0, np.int64)
            pad_idx, buckets, run_order = reductions.pow2_pad_plan(
                order, first, counts, sentinel=nrows)
            # the reduce emits runs in run_order; permute the target ids
            return pad_idx, buckets, uniq[run_order]

        r_pad, r_buckets, r_ids = _runs(ro, rseg, runiq, len(br))
        c_pad, c_buckets, c_ids = _runs(np.arange(len(co), dtype=np.int32),
                                        cseg, cuniq, len(co))
        self._mv_df_plan = (r_pad, r_buckets, r_ids, c_pad, c_buckets, c_ids)

    # -- system assembly (jit-safe) -----------------------------------------

    def system(self, arrays):
        """Linearize + assemble block-sparse H and padded gradient g.

        Returns (blocks (B+1, d*d) — FLAT block store, one row per stored
        (d, d) block, last row the zero sentinel for padded gathers — and
        g (nvars, d)).  The flat layout exists because TPU scatter-adds of
        (n, d, d) updates into a (B, d, d) store measured 3x slower than the
        same scatter in (n, d*d) rows (round-5 microbenchmark); every
        consumer reshapes at the use site, which is free."""
        d = self.d
        dt = _default_dtype()
        sym = self.sym
        lin = self.bound.linearize(arrays)
        h_contrib, g_contrib = [], []
        for (wJ, bvec), bt in zip(lin, self.bound.graph.batches):
            dims = bt.dims()
            for s in range(bt.arity):
                gi = bt.sign * jnp.einsum("nrd,nr->nd", wJ[s], bvec)
                g_contrib.append(jnp.pad(gi, ((0, 0), (0, d - dims[s]))))
            for s1 in range(bt.arity):
                for s2 in range(s1, bt.arity):
                    Hij = bt.sign * jnp.einsum("nri,nrj->nij",
                                               wJ[s1], wJ[s2])
                    Hij = jnp.pad(Hij, ((0, 0), (0, d - dims[s1]),
                                        (0, d - dims[s2])))
                    h_contrib.append(Hij)
        # flips per pair were computed host-side in plan order
        h_list = []
        for (s1, s2, flip, pos), Hij in zip(self._asm_plan, h_contrib):
            Hij = jnp.where(jnp.asarray(flip)[:, None, None],
                            jnp.swapaxes(Hij, 1, 2), Hij)
            h_list.append(Hij)
        blocks = jnp.zeros((self.B + 1, d * d), dtype=dt)
        if h_list:
            allH = jnp.concatenate(h_list, axis=0).reshape(-1, d * d)
            allH = allH[self._asm_order]
            segH = jax.ops.segment_sum(allH, self._asm_seg,
                                       num_segments=len(self._asm_uniq))
            blocks = blocks.at[self._asm_uniq].add(segH)
        g = jnp.zeros((self.nvars, d), dtype=dt)
        if g_contrib:
            allG = jnp.concatenate(g_contrib, axis=0)[self._g_order]
            segG = jax.ops.segment_sum(allG, self._g_seg,
                                       num_segments=len(self._g_uniq))
            g = g.at[self._g_uniq].add(segG)
        pad = jnp.asarray(self.pad_diag, dtype=dt)
        eye_pad = jax.vmap(jnp.diag)(pad).reshape(-1, d * d)
        blocks = blocks.at[sym.diag_block_by_col].add(eye_pad)
        return blocks, g

    # -- numeric factorization (jit-safe) ------------------------------------

    def factorize(self, blocks, lam=0.0, diagonal_damping: bool = False,
                  min_diag: float = 1e-6, max_diag: float = 1e32):
        """blocks (B+1,d,d) -> (blocks L, per-level dense factors, ok, badcol).

        ok is a scalar bool (all pivots finite and positive); badcol is the
        first offending permuted column id (or -1) for failure reporting —
        the reference throws IndeterminantLinearSystemException from
        splitConditional (gtsam/linear/JacobianFactor.cpp:838)."""
        sym = self.sym
        d = self.d
        dt = blocks.dtype
        true_dims = 1.0 - jnp.asarray(self.pad_diag, dtype=dt)  # (n, d)
        diag_idx = np.arange(d) * d + np.arange(d)              # flat diagonal
        if diagonal_damping:
            dvec = blocks[sym.diag_block_by_col][:, diag_idx]   # (n, d)
            dvec = jnp.clip(dvec, min_diag, max_diag)
            damp = lam * dvec * true_dims
        else:
            damp = lam * true_dims
        blocks = blocks.at[sym.diag_block_by_col[:, None],
                           diag_idx[None, :]].add(damp)
        Ldiag_l, Lpanel_l = [], []
        ok = jnp.asarray(True)
        badcol = jnp.asarray(-1, dtype=jnp.int32)
        for lp in self.level_plans:
            S, W, R = lp.S, lp.W, lp.R
            G = blocks[lp.diag_ids].reshape(S, W, W, d, d)
            G = jnp.where(jnp.asarray(lp.diag_flip)[..., None, None],
                          jnp.swapaxes(G, -1, -2), G)
            front = G.transpose(0, 1, 3, 2, 4).reshape(S, W * d, W * d)
            front = front + jax.vmap(jnp.diag)(
                jnp.asarray(lp.diag_pad, dtype=dt))
            L = jnp.linalg.cholesky(front)
            piv = jnp.diagonal(L, axis1=-2, axis2=-1)     # (S, W*d)
            valid = jnp.asarray(lp.valid_diag)
            bad = valid & (~jnp.isfinite(piv) | (piv <= 0))
            lvl_ok = ~jnp.any(bad)
            # first bad pivot -> its column id
            flat_bad = bad.reshape(-1)
            idx = jnp.argmax(flat_bad)
            col_of_piv = jnp.repeat(jnp.asarray(lp.col_vars, dtype=jnp.int32)
                                    .reshape(-1), d)
            lvl_bad = jnp.where(jnp.any(flat_bad), col_of_piv[idx],
                                jnp.asarray(-1, jnp.int32))
            badcol = jnp.where(ok & ~lvl_ok, lvl_bad, badcol)
            ok = ok & lvl_ok
            # zero out rows/cols of padded slots so scattered blocks stay clean
            L = jnp.where(jnp.isfinite(L), L, 0.0)
            Ldiag_l.append(L)
            # NOTE: L is deliberately NOT written back into the block store —
            # every consumer (solve_factored/_solve_padded, refinement) reads
            # the per-level dense factors, and the two L scatters plus the
            # (d,d)-granular relayouts they forced measured ~17 ms of the
            # 42 ms sphere2500 factorize (round-5 ablation)
            if R == 0:
                Lpanel_l.append(None)
                continue
            P = blocks[lp.panel_ids].reshape(S, R, W, d, d)
            A_panel = P.transpose(0, 1, 3, 2, 4).reshape(S, R * d, W * d)
            Xt = jax.lax.linalg.triangular_solve(
                L, jnp.swapaxes(A_panel, 1, 2), left_side=True, lower=True)
            Lp = jnp.swapaxes(Xt, 1, 2)                   # A L^{-T}
            Lp = jnp.where(jnp.isfinite(Lp), Lp, 0.0)
            Lpanel_l.append(Lp)
            U = jnp.einsum("sij,skj->sik", Lp, Lp)        # (S, R*d, R*d) MXU
            Ub = U.reshape(S, R, d, R, d).transpose(0, 1, 3, 2, 4)
            Ub = Ub.reshape(S * R * R, d * d)
            seg = jax.ops.segment_sum(Ub[lp.schur_src], lp.schur_seg,
                                      num_segments=len(lp.schur_tgt))
            blocks = blocks.at[lp.schur_tgt].add(-seg)
        return (None, Ldiag_l, Lpanel_l, ok, badcol)

    def _damp_vec(self, blocks, lam, diagonal_damping,
                  min_diag=1e-6, max_diag=1e32):
        """(n, d) additive diagonal damping, matching factorize()."""
        dt = blocks.dtype
        true_dims = 1.0 - jnp.asarray(self.pad_diag, dtype=dt)
        if diagonal_damping:
            diag_idx = np.arange(self.d) * self.d + np.arange(self.d)
            dvec = blocks[self.sym.diag_block_by_col][:, diag_idx]
            dvec = jnp.clip(dvec, min_diag, max_diag)
            return lam * dvec * true_dims
        return lam * true_dims

    def matvec(self, blocks, x, lam=0.0, diagonal_damping: bool = False):
        """(H + damping) x on the block-sparse store; x, result (n, d) in
        PERMUTED layout.  Runs in x.dtype — pass f64 x (x64 sessions) for the
        high-precision refinement residual."""
        sym = self.sym
        dt = x.dtype
        d = self.d
        ro, rseg, runiq, offd, coi, cseg, cuniq = self._mv_plan
        Bv = blocks[:self.B].reshape(self.B, d, d).astype(dt)
        t1 = jnp.einsum("bij,bj->bi", Bv, x[sym.block_col])
        y = jnp.zeros((self.nvars, self.d), dtype=dt)
        s1 = jax.ops.segment_sum(t1[ro], rseg, num_segments=len(runiq))
        y = y.at[runiq].add(s1)
        if len(offd):
            Bo = blocks[coi].reshape(len(coi), d, d).astype(dt)
            t2 = jnp.einsum("bij,bi->bj", Bo,
                            x[sym.block_row[coi]])
            s2 = jax.ops.segment_sum(t2, cseg, num_segments=len(cuniq))
            y = y.at[cuniq].add(s2)
        damp = self._damp_vec(blocks, lam, diagonal_damping).astype(dt)
        return y + damp * x

    def matvec_df(self, blocks, x, lam=0.0, diagonal_damping: bool = False):
        """(H + damping) x with two-float accuracy.  x is a (hi, lo) pair of
        (n, d) f32 arrays in PERMUTED layout; returns a pair.

        Products of stored f32 blocks with x.hi are exact (Dekker
        two-product) and all accumulation is compensated — the residual
        r = g - H x keeps ~48 significant bits without any emulated f64
        (which costs 10-30x on the TPU VPU and bloats the program)."""
        sym = self.sym
        xh, xl = x
        ro, rseg, runiq, offd, coi, cseg, cuniq = self._mv_plan
        r_pad, r_buckets, r_ids, c_pad, c_buckets, c_ids = self._mv_df_plan
        d = self.d
        Bv = blocks[:self.B].reshape(self.B, d, d)
        xkh = xh[sym.block_col]
        xkl = xl[sym.block_col]

        def bdot(Bm, vh, vl, transpose=False):
            # t[b, i] = sum_j Bm[b, i, j] * v[b, j]  (or B^T when transpose)
            acc = None
            for j in range(d):
                col = Bm[:, j, :] if transpose else Bm[:, :, j]
                t = tf.mul_f(vh[:, j, None], vl[:, j, None], col)
                acc = t if acc is None else tf.add(*acc, *t)
            return acc

        t1 = bdot(Bv, xkh, xkl)                                # (B, d) pair
        yh, yl = reductions.padded_reduce_df(
            t1, r_pad, r_buckets, self.nvars, r_ids)
        if len(offd):
            Bo = blocks[coi].reshape(len(coi), d, d)
            xrh = xh[sym.block_row[coi]]
            xrl = xl[sym.block_row[coi]]
            t2 = bdot(Bo, xrh, xrl, transpose=True)
            y2h, y2l = reductions.padded_reduce_df(
                t2, c_pad, c_buckets, self.nvars, c_ids)
            yh, yl = tf.add(yh, yl, y2h, y2l)
        damp = self._damp_vec(blocks, lam, diagonal_damping)
        dx = tf.mul_f(xh, xl, damp)
        return tf.add(yh, yl, *dx)

    def solve_refined_df(self, blocks, g, lam=0.0,
                         diagonal_damping: bool = False,
                         refine_iters: int = 2):
        """f32 factorization + TWO-FLOAT iterative refinement.

        The TPU-native version of solve_refined: same math, but the residual
        chain runs on (hi, lo) f32 pairs instead of emulated f64 — native
        VPU speed and a compact program.  Restores the f64-trajectory LM
        step quality that lets sphere2500-class problems converge in the
        reference's ~4-5 iterations instead of ~8 (round-4 measurement)."""
        factored = self.factorize(blocks, lam, diagonal_damping)
        x = self._solve_padded(factored, g)
        if refine_iters:
            g_pair = (g, jnp.zeros_like(g)) if g.dtype == x.dtype \
                else tf.from_f64(g)
            xp = (x, jnp.zeros_like(x))
            for _ in range(refine_iters):
                mv = self.matvec_df(blocks, xp, lam, diagonal_damping)
                rh, rl = tf.sub(g_pair[0], g_pair[1], mv[0], mv[1])
                corr = self._solve_padded(factored, rh + rl)
                xp = tf.add(*xp, corr, jnp.zeros_like(corr))
            x = tf.to_f32(*xp)
        return self._flatten(x)

    def solve_refined(self, blocks, g, lam=0.0,
                      diagonal_damping: bool = False, refine_iters: int = 2):
        """Factorize in working precision (f32 on TPU) + iterative refinement
        with the residual accumulated in f64 when x64 is live.

        This is the sparse-solver half of the 'f32 compute + f64 accumulate'
        policy: a plain f32 factorization of a 1e6-conditioned pose-graph
        Hessian loses ~1e-1 of the step, which LM reads as a failed step and
        answers with lambda inflation (measured on sphere2500: lambda climbs
        to 1 and convergence crawls); two refinement passes restore the step
        to working-precision accuracy for two extra back-substitutions and
        one sparse matvec each."""
        factored = self.factorize(blocks, lam, diagonal_damping)
        x = self._solve_padded(factored, g)
        if refine_iters:
            hi = jnp.float64 if jax.config.jax_enable_x64 else x.dtype
            g_hi = g.astype(hi)
            x_hi = x.astype(hi)
            for _ in range(refine_iters):
                r = g_hi - self.matvec(blocks, x_hi, lam, diagonal_damping)
                corr = self._solve_padded(factored, r.astype(x.dtype))
                x_hi = x_hi + corr.astype(hi)
            x = x_hi.astype(x.dtype)
        return self._flatten(x)

    def solve_factored(self, factored, g):
        """Forward + backward substitution; returns flat delta (canonical)."""
        return self._flatten(self._solve_padded(factored, g))

    def _solve_padded(self, factored, g):
        """Fwd + bwd substitution; returns x (n, d) in PERMUTED layout."""
        _, Ldiag_l, Lpanel_l, _, _ = factored
        n, d = self.nvars, self.d
        dt = Ldiag_l[0].dtype if Ldiag_l else _default_dtype()
        g_ext = jnp.concatenate([g.astype(dt), jnp.zeros((1, d), dtype=dt)])
        acc = jnp.zeros((n + 1, d), dtype=dt)
        ys = []
        for lp, L, P in zip(self.level_plans, Ldiag_l, Lpanel_l):
            S, W, R = lp.S, lp.W, lp.R
            rhs = (g_ext - acc)[lp.col_vars].reshape(S, W * d)
            y = jax.lax.linalg.triangular_solve(
                L, rhs[..., None], left_side=True, lower=True)[..., 0]
            ys.append(y)
            if P is not None:
                c = jnp.einsum("sij,sj->si", P, y)         # (S, R*d)
                cb = c.reshape(S * R, d)
                seg = jax.ops.segment_sum(cb[lp.fwd_src], lp.fwd_seg,
                                          num_segments=len(lp.fwd_tgt))
                acc = acc.at[lp.fwd_tgt].add(seg)
        x_ext = jnp.zeros((n + 1, d), dtype=dt)
        for lp, L, P, y in zip(reversed(self.level_plans), reversed(Ldiag_l),
                               reversed(Lpanel_l), reversed(ys)):
            S, W, R = lp.S, lp.W, lp.R
            rhs = y
            if P is not None:
                xr = x_ext[lp.row_vars].reshape(S, R * d)
                rhs = rhs - jnp.einsum("sij,si->sj", P, xr)
            x = jax.lax.linalg.triangular_solve(
                L, rhs[..., None], left_side=True, lower=True,
                transpose_a=True)[..., 0]
            xb = x.reshape(S * W, d)
            x_ext = x_ext.at[lp.x_sc_tgt].set(xb[lp.x_sc_src])
        return x_ext[:n]

    def _flatten(self, x):
        """(n, d) permuted-padded solution -> flat delta (canonical layout)."""
        dt = x.dtype
        delta = jnp.zeros(self.layout.total_dim, dtype=dt)
        x_old = x[self.sym.inv_perm]
        for dim in np.unique(self.var_dims):
            sel = np.where(self.var_dims == dim)[0]
            offs = self.var_offsets[sel]
            idx = offs[:, None] + np.arange(dim)[None, :]
            delta = delta.at[idx.reshape(-1)].set(
                x_old[sel, :dim].reshape(-1))
        return delta

    def pack_rhs(self, vec):
        """Canonical flat (total_dim,) vector -> (nvars, d) permuted-padded
        gradient layout (inverse of _flatten)."""
        out = jnp.zeros((self.nvars, self.d), dtype=vec.dtype)
        for dim in np.unique(self.var_dims):
            sel = np.where(self.var_dims == dim)[0]
            offs = self.var_offsets[sel]
            idx = offs[:, None] + np.arange(dim)[None, :]
            rows = self.sym.inv_perm[sel]
            out = out.at[rows[:, None], np.arange(dim)[None, :]].set(
                vec[idx.reshape(-1)].reshape(len(sel), dim))
        return out

    def solve(self, arrays, lam=0.0, diagonal_damping: bool = False,
              refine_iters: int = 0):
        blocks, g = self.system(arrays)
        if refine_iters:
            return self.solve_refined(blocks, g, lam, diagonal_damping,
                                      refine_iters)
        factored = self.factorize(blocks, lam, diagonal_damping)
        return self.solve_factored(factored, g)

    # -- multifrontal QR (sparse EliminateQR analog) -------------------------
    #
    # The reference's default Gaussian elimination is QR on the stacked
    # whitened Jacobian rows (gtsam/linear/JacobianFactor.cpp:778-838
    # EliminateQR under the junction tree).  TPU-native version: per
    # assembly-tree level, gather each supernode's front as
    #   [ whitened factor rows | children's passed-up R rows | sqrt(lam) I ]
    # over the front's columns ([snode cols | row structure], the exact
    # layout of the Cholesky level plans), run ONE batched reduced QR per
    # level, keep R's frontal part as the factor (L = R^T feeds the SAME
    # level-batched substitution as the Cholesky path), and pass R's
    # separator block up to the parent front.  Never forms the Gram matrix:
    # conditioning is kappa(A), not kappa(A)^2.

    def _qr_plan(self):
        if getattr(self, "_qr_plan_cache", None) is not None:
            return self._qr_plan_cache
        sym = self.sym
        d = self.d
        nsuper = sym.nsuper
        rbmax = max((len(r) for r in sym.snode_rows), default=0)
        rbmax = max(rbmax, 1)

        # front position of a permuted column within snode s: frontal cols
        # at [0, w), struct cols at [W_level, W_level + r) — matching the
        # level plan's (W-padded frontal | struct) block layout
        W_of = {}
        for lp in self.level_plans:
            for s in lp.snodes:
                W_of[int(s)] = lp.W
        pos_cache = {}

        def pos_in_front(s, pcol):
            key = (int(s), int(pcol))
            if key in pos_cache:
                return pos_cache[key]
            c0, w = int(sym.snode_start[s]), int(sym.snode_width[s])
            if c0 <= pcol < c0 + w:
                p = int(pcol) - c0
            else:
                p = W_of[int(s)] + int(np.searchsorted(sym.snode_rows[s],
                                                       pcol))
            pos_cache[key] = p
            return p

        # slot pool layout: contiguous per (batch, slot)
        rmax = 1
        bs_off = []
        tot = 0
        for b in self.bound.graph.batches:
            offs = []
            rmax = max(rmax, int(b.rdim))
            for s in range(b.arity):
                offs.append(tot)
                tot += b.num_factors
            bs_off.append(offs)
        SENT_POOL = tot

        # factor -> front assignment + cell map entries
        fgroups = [[] for _ in range(nsuper)]   # per snode: {pos: pool id}
        for bi, ids in enumerate(self.batch_var_ids):
            pcols = sym.inv_perm[ids]            # (N, arity)
            smin = sym.snode_of[pcols.min(axis=1)]
            for i in range(ids.shape[0]):
                s = int(smin[i])
                cells = {}
                for a in range(ids.shape[1]):
                    cells[pos_in_front(s, pcols[i, a])] = bs_off[bi][a] + i
                fgroups[s].append(cells)

        # children contribution row-groups
        children = [[] for _ in range(nsuper)]
        for c in range(nsuper):
            p = sym.snode_parent[c]
            if p >= 0:
                children[int(p)].append(c)
        NCON = nsuper * rbmax * rbmax
        SENT_CON = NCON       # always-zero read slot
        DUMP_CON = NCON + 1   # write dump for padded scatter entries

        levels = []
        for lp in self.level_plans:
            S, W, R = lp.S, lp.W, lp.R
            WR = W + R
            gmax = max((len(fgroups[int(s)]) for s in lp.snodes), default=0)
            gmax = max(gmax, 1)
            hmax = max((sum(len(sym.snode_rows[c]) for c in
                            children[int(s)]) for s in lp.snodes), default=0)
            cellF = np.full((S, gmax, WR), SENT_POOL, dtype=np.int32)
            cellC = np.full((S, max(hmax, 1), WR), SENT_CON, dtype=np.int32)
            sep_tgt = np.full((S * R * R,), DUMP_CON, dtype=np.int32)
            for si, s in enumerate(lp.snodes):
                s = int(s)
                for gi, cells in enumerate(fgroups[s]):
                    for p, pid in cells.items():
                        cellF[si, gi, p] = pid
                hi = 0
                for c in children[s]:
                    rc = len(sym.snode_rows[c])
                    pos_c = [pos_in_front(s, pc) for pc in sym.snode_rows[c]]
                    for j in range(rc):
                        for k in range(j, rc):
                            cellC[si, hi, pos_c[k]] = \
                                (c * rbmax + j) * rbmax + k
                        hi += 1
                # this snode's own R_sep scatter targets
                rs = len(sym.snode_rows[s])
                for j in range(rs):
                    for k in range(j, rs):
                        sep_tgt[(si * R + j) * R + k] = \
                            (s * rbmax + j) * rbmax + k
            levels.append(dict(cellF=cellF, cellC=cellC, sep_tgt=sep_tgt,
                               gmax=gmax, hmax=max(hmax, 1)))
        self._qr_plan_cache = dict(levels=levels, rmax=rmax, bs_off=bs_off,
                                   tot=tot, rbmax=rbmax, ncon=NCON + 2)
        return self._qr_plan_cache

    def factorize_qr(self, arrays, lam=0.0, pivot_tol=1e-10):
        """Multifrontal QR of the whitened Jacobian (+ sqrt(lam) damping
        rows).  Returns the same `factored` tuple as factorize(), so
        solve_factored / solve_refined(_df) work unchanged (R^T takes L's
        place; signs of R's rows are irrelevant to the substitution)."""
        qp = self._qr_plan()
        sym = self.sym
        d = self.d
        dt = _default_dtype()
        rmax = qp["rmax"]
        lin = self.bound.linearize(arrays)
        pool = jnp.zeros((qp["tot"] + 1, rmax, d), dtype=dt)
        for (wJ, bvec), b, offs in zip(lin, self.bound.graph.batches,
                                       qp["bs_off"]):
            for s in range(b.arity):
                blk = jnp.asarray(wJ[s], dtype=dt)
                N, r, ds = blk.shape
                blk = jnp.pad(blk, ((0, 0), (0, rmax - r), (0, d - ds)))
                pool = jax.lax.dynamic_update_slice(pool, blk,
                                                    (offs[s], 0, 0))
        contrib = jnp.zeros((qp["ncon"], d, d), dtype=dt)
        sqrt_lam = jnp.sqrt(jnp.asarray(lam, dtype=dt))
        Ldiag_l, Lpanel_l = [], []
        ok = jnp.asarray(True)
        badcol = jnp.asarray(-1, dtype=jnp.int32)
        for lp, ql in zip(self.level_plans, qp["levels"]):
            S, W, R = lp.S, lp.W, lp.R
            Wd, Rd = W * d, R * d
            C = Wd + Rd
            FR = pool[jnp.asarray(ql["cellF"])]     # (S, G, WR, rmax, d)
            FRr = FR.transpose(0, 1, 3, 2, 4).reshape(S, -1, C)
            CR = contrib[jnp.asarray(ql["cellC"])]  # (S, H, WR, d, d)
            CRr = CR.transpose(0, 1, 3, 2, 4).reshape(S, -1, C)
            # damping + padded-dim identity rows on the frontal columns
            vd = jnp.asarray(lp.valid_diag)                     # (S, Wd)
            dvals = jnp.where(vd, sqrt_lam, jnp.asarray(1.0, dt))
            diag_rows = dvals[:, :, None] * jnp.eye(Wd, C, dtype=dt)[None]
            front = jnp.concatenate([FRr, CRr, diag_rows], axis=1)
            TR = front.shape[1]
            if TR < C:
                front = jnp.pad(front, ((0, 0), (0, C - TR), (0, 0)))
            Rfull = jnp.linalg.qr(front, mode="r")              # (S, C, C)
            piv = jnp.abs(jnp.diagonal(Rfull[:, :Wd, :Wd],
                                       axis1=-2, axis2=-1))
            bad = vd & (~jnp.isfinite(piv) | (piv <= pivot_tol))
            lvl_ok = ~jnp.any(bad)
            flat_bad = bad.reshape(-1)
            idx = jnp.argmax(flat_bad)
            col_of_piv = jnp.repeat(
                jnp.asarray(lp.col_vars, dtype=jnp.int32).reshape(-1), d)
            lvl_bad = jnp.where(jnp.any(flat_bad), col_of_piv[idx],
                                jnp.asarray(-1, jnp.int32))
            badcol = jnp.where(ok & ~lvl_ok, lvl_bad, badcol)
            ok = ok & lvl_ok
            L = jnp.swapaxes(Rfull[:, :Wd, :Wd], 1, 2)
            L = jnp.where(jnp.isfinite(L), L, 0.0)
            Ldiag_l.append(L)
            if R == 0:
                Lpanel_l.append(None)
                continue
            Lp = jnp.swapaxes(Rfull[:, :Wd, Wd:C], 1, 2)        # (S, Rd, Wd)
            Lp = jnp.where(jnp.isfinite(Lp), Lp, 0.0)
            Lpanel_l.append(Lp)
            Rsep = Rfull[:, Wd:C, Wd:C]
            blks = Rsep.reshape(S, R, d, R, d).transpose(0, 1, 3, 2, 4)
            contrib = contrib.at[jnp.asarray(ql["sep_tgt"])].set(
                blks.reshape(S * R * R, d, d))
        return (None, Ldiag_l, Lpanel_l, ok, badcol)

    def solve_qr(self, arrays, g=None, lam=0.0, refine_iters: int = 0,
                 blocks=None):
        """QR-factorize and solve; optional two-float refinement against the
        Gram matvec (needs `blocks` from system())."""
        if g is None or (refine_iters and blocks is None):
            blocks, g = self.system(arrays)
        factored = self.factorize_qr(arrays, lam)
        x = self._solve_padded(factored, g)
        if refine_iters:
            xp = (x, jnp.zeros_like(x))
            g_pair = (g, jnp.zeros_like(g))
            for _ in range(refine_iters):
                mv = self.matvec_df(blocks, xp, lam)
                rh, rl = tf.sub(g_pair[0], g_pair[1], mv[0], mv[1])
                corr = self._solve_padded(factored, rh + rl)
                xp = tf.add(*xp, corr, jnp.zeros_like(corr))
            x = tf.to_f32(*xp)
        return self._flatten(x)

    # -- failure surfacing (host) --------------------------------------------

    def check_system(self, arrays, lam=0.0):
        """Factorize and raise IndeterminantLinearSystemError on bad pivots
        (the reference's splitConditional throw, JacobianFactor.cpp:838)."""
        blocks, _ = self.system(arrays)
        _, _, _, ok, badcol = self.factorize(blocks, lam)
        if not bool(ok):
            c = int(badcol)
            orig = int(self.sym.perm[c]) if c >= 0 else -1
            raise IndeterminantLinearSystemError(orig)
