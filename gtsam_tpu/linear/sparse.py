"""Sparse block Cholesky: host-planned, level-scheduled, batched on device.

This replaces the reference's multifrontal elimination (GaussianJunctionTree →
per-clique EliminatePreferCholesky under a TBB task tree, ClusterTree-inst.h:285)
with a TPU-native design: the symbolic analysis (inference/symbolic.py) emits a
STATIC schedule of per-level index arrays; the numeric phase is, per level,
  1. one batched scatter-add of update products  L[i,k] @ L[j,k]^T
  2. one batched dense Cholesky of the level's diagonal blocks
  3. one batched triangular solve for the level's subdiagonal blocks
All variable blocks are padded to a uniform dim d (identity on padding diagonal),
so every kernel is a fixed-shape batched op XLA maps onto the MXU/VPU.
Forward/backward substitution reuse the same level schedule.
"""

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..graph import manifolds
from ..graph.graph import BoundGraph
from ..inference import ordering as ordering_mod
from ..inference import symbolic as symbolic_mod


@dataclasses.dataclass
class _LevelIndices:
    cols: np.ndarray           # columns in this level
    diag_ids: np.ndarray       # block ids of their diagonals
    sub_ids: np.ndarray        # block ids of their subdiagonal blocks
    sub_col_pos: np.ndarray    # for each sub block: position of its column in cols
    triples: Tuple[np.ndarray, np.ndarray, np.ndarray]
    # forward solve: blocks with ROW in this level, col outside (earlier levels)
    fwd_ids: np.ndarray
    fwd_src: np.ndarray        # column (k) of each such block
    fwd_dst: np.ndarray        # row (j) of each such block


class SparseCholeskySolver:
    """Builds once per (graph structure, values structure); jit-safe methods."""

    def __init__(self, bound: BoundGraph, order: str = "nd",
                 min_level_cols: int = 8):
        layout = bound.layout
        self.layout = layout
        # global variable ids: (type, row) -> id, in layout order
        self.var_dims = []
        self.var_offsets = []  # offset in canonical flat delta
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

        # factor structure -> var-id keys per batch
        self.batch_var_ids = []
        factor_keys = []
        for b, st in zip(bound.graph.batches, bound.structures):
            ids = np.stack([
                np.asarray([var_id[(t, int(r))] for r in st.rows[s]])
                for s, t in enumerate(b.var_types)], axis=1)
            self.batch_var_ids.append(ids)
            factor_keys.append(ids)

        adj = ordering_mod.adjacency_from_factors(factor_keys, self.nvars)
        if order == "natural":
            perm = ordering_mod.natural(self.nvars)
        elif order == "amd":
            perm = ordering_mod.minimum_degree(adj)
        else:
            perm = ordering_mod.nested_dissection(adj)
        self.sym = symbolic_mod.analyze(adj, perm)
        sym = self.sym

        # -- dense root supernode split ------------------------------------
        # Levels whose column count falls below min_level_cols form the tree's
        # sequential tail (separator chains); their columns (ancestor-closed)
        # are eliminated as ONE dense frontal matrix — the multifrontal root
        # supernode — instead of hundreds of tiny sequential levels.
        nlev_all = len(sym.levels)
        L_cut = nlev_all
        for lv, cols in enumerate(sym.levels):
            if len(cols) < min_level_cols:
                L_cut = lv
                break
        tail_mask = sym.col_level >= L_cut  # by NEW column id
        self.tail_cols = np.where(tail_mask)[0].astype(np.int32)
        self.tail_pos = np.full(self.nvars, -1, dtype=np.int32)
        self.tail_pos[self.tail_cols] = np.arange(len(self.tail_cols))
        self.n_tail = len(self.tail_cols)
        self.L_cut = L_cut

        # per-level index bundles
        self.level_indices: List[_LevelIndices] = []
        col_arrays = {}  # col -> list of (block_id)
        row_arrays = {}
        for bid in range(sym.nnz_blocks):
            i, j = int(sym.block_row[bid]), int(sym.block_col[bid])
            if i != j:
                col_arrays.setdefault(j, []).append(bid)
                row_arrays.setdefault(i, []).append((bid, j))
        for lv, cols in enumerate(sym.levels[:L_cut]):
            diag_ids = sym.diag_block_by_col[cols]
            sub_ids, sub_pos = [], []
            for p, j in enumerate(cols):
                for bid in col_arrays.get(int(j), []):
                    sub_ids.append(bid)
                    sub_pos.append(p)
            fwd_ids, fwd_src, fwd_dst = [], [], []
            for j in cols:
                for (bid, k) in row_arrays.get(int(j), []):
                    fwd_ids.append(bid)
                    fwd_src.append(int(k))
                    fwd_dst.append(int(j))
            self.level_indices.append(_LevelIndices(
                cols=np.asarray(cols, dtype=np.int32),
                diag_ids=np.asarray(diag_ids, dtype=np.int32),
                sub_ids=np.asarray(sub_ids, dtype=np.int32),
                sub_col_pos=np.asarray(sub_pos, dtype=np.int32),
                triples=sym.triples_by_level[lv],
                fwd_ids=np.asarray(fwd_ids, dtype=np.int32),
                fwd_src=np.asarray(fwd_src, dtype=np.int32),
                fwd_dst=np.asarray(fwd_dst, dtype=np.int32),
            ))

        # late triples: targets in tail levels, sources from LEADING columns
        # (tail-sourced updates are internal to the dense root factorization)
        lt_t, lt_ik, lt_jk = [], [], []
        for lv in range(L_cut, nlev_all):
            t, ik, jk = sym.triples_by_level[lv]
            if len(t) == 0:
                continue
            src_col = sym.block_col[ik]
            keep = sym.col_level[src_col] < L_cut
            lt_t.append(t[keep])
            lt_ik.append(ik[keep])
            lt_jk.append(jk[keep])
        cat = lambda xs: (np.concatenate(xs) if xs else np.zeros(0, dtype=np.int32))
        self.late_triples = (cat(lt_t), cat(lt_ik), cat(lt_jk))

        # tail dense structure
        tail_bids = np.where(tail_mask[sym.block_col])[0].astype(np.int32)
        self.tail_bids = tail_bids
        self.tail_r = self.tail_pos[sym.block_row[tail_bids]]
        self.tail_c = self.tail_pos[sym.block_col[tail_bids]]
        self.tail_diag_mask = (self.tail_r == self.tail_c)
        # blocks with row in tail, col leading (for tail forward-solve rhs)
        ft_mask = tail_mask[sym.block_row] & ~tail_mask[sym.block_col]
        self.ftail_bids = np.where(ft_mask)[0].astype(np.int32)
        self.ftail_src = sym.block_col[self.ftail_bids]          # leading col k
        self.ftail_dst = self.tail_pos[sym.block_row[self.ftail_bids]]

        # assembly plan: for each (batch, slot-pair): target block ids + flip
        self.assembly = []
        for bt, ids in zip(bound.graph.batches, self.batch_var_ids):
            arity = ids.shape[1]
            plan = []
            for s1 in range(arity):
                for s2 in range(s1, arity):
                    ni = sym.inv_perm[ids[:, s1]]
                    nj = sym.inv_perm[ids[:, s2]]
                    lo = np.minimum(ni, nj)
                    hi = np.maximum(ni, nj)
                    flip = ni < nj  # stored block is (hi, lo); Hij needs T if ni<nj
                    bids = np.asarray(
                        [sym.block_of[(int(h), int(l))] for h, l in zip(hi, lo)],
                        dtype=np.int32)
                    plan.append((s1, s2, bids, flip))
            self.assembly.append(plan)

        # rhs mapping: permuted var -> (offset, dim)
        self.pad_diag = np.zeros((self.nvars, self.d))
        for v in range(self.nvars):
            nv = sym.inv_perm[v]
            self.pad_diag[nv, self.var_dims[v]:] = 1.0
        self.bound = bound

    # -- system assembly (jit-safe) ---------------------------------------

    def system(self, arrays):
        """Linearize + assemble block-sparse H and padded gradient g.

        Returns (blocks (B, d, d) lower-triangle storage, g (nvars, d)).
        """
        d = self.d
        dt = _default_dtype()
        sym = self.sym
        B = sym.nnz_blocks
        blocks = jnp.zeros((B, d, d), dtype=dt)
        g = jnp.zeros((self.nvars, d), dtype=dt)
        lin = self.bound.linearize(arrays)
        for (wJ, bvec), bt, ids, plan in zip(
                lin, self.bound.graph.batches, self.batch_var_ids, self.assembly):
            dims = bt.dims()
            # gradient
            for s in range(bt.arity):
                gi = bt.sign * jnp.einsum("nrd,nr->nd", wJ[s], bvec)
                gi = jnp.pad(gi, ((0, 0), (0, d - dims[s])))
                g = g.at[sym.inv_perm[ids[:, s]]].add(gi)
            for (s1, s2, bids, flip) in plan:
                Hij = bt.sign * jnp.einsum("nri,nrj->nij", wJ[s1], wJ[s2])
                Hij = jnp.pad(Hij, ((0, 0), (0, d - dims[s1]), (0, d - dims[s2])))
                Hij = jnp.where(jnp.asarray(flip)[:, None, None],
                                jnp.swapaxes(Hij, 1, 2), Hij)
                blocks = blocks.at[bids].add(Hij)
        # identity on padding diagonal of diagonal blocks
        diag_ids = sym.diag_block_by_col  # (n,) — column j's diagonal
        pad = jnp.asarray(self.pad_diag, dtype=dt)  # (n, d), indexed by new id
        eye_pad = jax.vmap(jnp.diag)(pad)
        blocks = blocks.at[diag_ids].add(eye_pad)
        return blocks, g

    # -- numeric factorization + solve (jit-safe) --------------------------

    def factorize(self, blocks, lam=0.0):
        """A-blocks -> L-blocks (leading columns) + dense root Cholesky factor.

        Returns (blocks, L_tail (Td, Td) or None).
        """
        sym = self.sym
        d = self.d
        dt = blocks.dtype
        # damping on true dims only (padding already has its identity)
        damp = lam * (1.0 - jnp.asarray(self.pad_diag, dtype=dt))
        blocks = blocks.at[sym.diag_block_by_col].add(jax.vmap(jnp.diag)(damp))
        for li in self.level_indices:
            t, ik, jk = li.triples
            if len(t):
                prods = jnp.einsum("bij,bkj->bik", blocks[ik], blocks[jk])
                blocks = blocks.at[t].add(-prods)
            Ljj = jnp.linalg.cholesky(blocks[li.diag_ids])
            blocks = blocks.at[li.diag_ids].set(Ljj)
            if len(li.sub_ids):
                # L_ij = A_ij * L_jj^{-T}  ->  solve L_jj X^T = A_ij^T
                Aij = blocks[li.sub_ids]
                Lc = Ljj[li.sub_col_pos]
                Xt = jax.lax.linalg.triangular_solve(
                    Lc, jnp.swapaxes(Aij, 1, 2), left_side=True, lower=True)
                blocks = blocks.at[li.sub_ids].set(jnp.swapaxes(Xt, 1, 2))
        if self.n_tail == 0:
            return blocks, None
        # apply leading->tail updates, then factor the dense root supernode
        t, ik, jk = self.late_triples
        if len(t):
            prods = jnp.einsum("bij,bkj->bik", blocks[ik], blocks[jk])
            blocks = blocks.at[t].add(-prods)
        T = self.n_tail
        M = jnp.zeros((T * d, T * d), dtype=dt)
        r_idx = (self.tail_r[:, None, None] * d
                 + np.arange(d)[None, :, None]).astype(np.int32)
        c_idx = (self.tail_c[:, None, None] * d
                 + np.arange(d)[None, None, :]).astype(np.int32)
        vals = blocks[self.tail_bids]
        strict = ~self.tail_diag_mask
        M = M.at[r_idx, c_idx].add(vals)
        M = M.at[jnp.swapaxes(c_idx, 1, 2)[strict],
                 jnp.swapaxes(r_idx, 1, 2)[strict]].add(
            jnp.swapaxes(vals, 1, 2)[strict])
        L_tail = jnp.linalg.cholesky(M)
        return blocks, L_tail

    def solve_factored(self, factored, g):
        """Forward + backward substitution; returns flat delta (canonical layout)."""
        Lb, L_tail = factored
        n, d = self.nvars, self.d
        dt = Lb.dtype
        y = jnp.zeros((n, d), dtype=dt)
        # forward: levels in order
        for li in self.level_indices:
            rhs = g[li.cols]
            if len(li.fwd_ids):
                contrib = jnp.einsum("bij,bj->bi", Lb[li.fwd_ids], y[li.fwd_src])
                acc = jnp.zeros((n, d), dtype=dt).at[li.fwd_dst].add(contrib)
                rhs = rhs - acc[li.cols]
            Ljj = Lb[self.sym.diag_block_by_col[li.cols]]
            yj = jax.lax.linalg.triangular_solve(
                Ljj, rhs[..., None], left_side=True, lower=True)[..., 0]
            y = y.at[li.cols].set(yj)
        x = jnp.zeros((n, d), dtype=dt)
        if self.n_tail:
            T = self.n_tail
            rhs_t = g[self.tail_cols]
            if len(self.ftail_bids):
                contrib = jnp.einsum("bij,bj->bi", Lb[self.ftail_bids],
                                     y[self.ftail_src])
                rhs_t = rhs_t.at[self.ftail_dst].add(-contrib)
            y_t = jax.scipy.linalg.solve_triangular(
                L_tail, rhs_t.reshape(-1), lower=True)
            x_t = jax.scipy.linalg.solve_triangular(
                L_tail, y_t, lower=True, trans=1).reshape(T, d)
            x = x.at[self.tail_cols].set(x_t)
        # backward: leading levels in reverse; x_j = L_jj^{-T}(y_j - sum L_ij^T x_i)
        for li in reversed(self.level_indices):
            rhs = y[li.cols]
            if len(li.sub_ids):
                rows = self.sym.block_row[li.sub_ids]
                contrib = jnp.einsum("bij,bi->bj", Lb[li.sub_ids], x[rows])
                acc = jnp.zeros((n, d), dtype=dt).at[
                    self.sym.block_col[li.sub_ids]].add(contrib)
                rhs = rhs - acc[li.cols]
            Ljj = Lb[self.sym.diag_block_by_col[li.cols]]
            xj = jax.lax.linalg.triangular_solve(
                Ljj, rhs[..., None], left_side=True, lower=True,
                transpose_a=True)[..., 0]
            x = x.at[li.cols].set(xj)
        # un-permute + un-pad into canonical flat delta
        delta = jnp.zeros(self.layout.total_dim, dtype=dt)
        x_old = x[self.sym.inv_perm]  # (nvars, d) indexed by ORIGINAL var id
        for dim in np.unique(self.var_dims):
            sel = np.where(self.var_dims == dim)[0]
            offs = self.var_offsets[sel]
            idx = offs[:, None] + np.arange(dim)[None, :]
            delta = delta.at[idx.reshape(-1)].set(
                x_old[sel, :dim].reshape(-1))
        return delta

    def solve(self, arrays, lam=0.0):
        blocks, g = self.system(arrays)
        factored = self.factorize(blocks, lam)
        return self.solve_factored(factored, g)
