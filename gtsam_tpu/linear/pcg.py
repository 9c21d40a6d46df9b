"""Matrix-free preconditioned conjugate gradient on the GN normal equations.

Reference: gtsam/linear/PCGSolver.h:55, iterative.h:104 (ConjugateGradientSolver),
Preconditioner.h:64 (BlockJacobi).  The Hessian is never materialized: the
matvec v -> (J^T J + lam) v runs as two batched einsums per factor batch plus
scatter-adds (exactly the RegularImplicitSchurFactor::multiplyHessianAdd idea,
slam/RegularImplicitSchurFactor.h:272, generalized to any graph).
"""

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..graph import manifolds
from ..graph.graph import BoundGraph


class PCGSolver:
    """Pluggable solver for the nonlinear optimizers (matrix-free CG)."""

    def __init__(self, max_iterations: int = 500, tol: float = 1e-9):
        self.max_iterations = max_iterations
        self.tol = tol

    def bind(self, bound: BoundGraph):
        if getattr(bound, "num_constraints", 0) > 0:
            # Hard sigma==0 rows whiten to weight 0 — PCG would silently drop
            # the constraint.  Only the dense KKT path supports them.
            raise NotImplementedError(
                "PCG solvers do not support constrained (sigma==0) noise; "
                "use the dense solver's KKT path")
        self._bound = bound
        layout = bound.layout
        self._layout = layout
        # per (batch, slot): flat gather indices (N, d_s)
        self._slot_idx = []
        for b, st in zip(bound.graph.batches, bound.structures):
            idxs = []
            for s in range(b.arity):
                d = manifolds.get(b.var_types[s]).dim
                idxs.append(st.col_offsets[s][:, None] + np.arange(d)[None, :])
            self._slot_idx.append(idxs)
        # per type: flat indices for block-Jacobi assembly
        self._total = layout.total_dim
        self._dmax = max((manifolds.get(t).dim for t in layout.type_order),
                         default=1)
        self._nvar_offsets = (np.concatenate(
            [layout.offsets[t] for t in layout.type_order])
            if layout.type_order else np.zeros(0, np.int32))
        self._var_dims = (np.concatenate(
            [np.full(len(layout.offsets[t]), manifolds.get(t).dim)
             for t in layout.type_order])
            if layout.type_order else np.zeros(0, np.int64))
        return self

    def system(self, arrays):
        lin = self._bound.linearize(arrays)
        # gradient g = J^T b and block-diagonal preconditioner
        g = jnp.zeros(self._total, dtype=_default_dtype())
        # block-jacobi: per variable (uniform pad to max dim)
        dmax = self._dmax
        nvar_offsets = self._nvar_offsets
        var_dims = self._var_dims
        off_to_var = {int(o): i for i, o in enumerate(nvar_offsets)}
        nv = len(nvar_offsets)
        diag = jnp.zeros((nv, dmax, dmax), dtype=_default_dtype())
        for (wJ, bvec), idxs, (bt, st) in zip(
                lin, self._slot_idx,
                zip(self._bound.graph.batches, self._bound.structures)):
            for s in range(bt.arity):
                gi = jnp.einsum("nrd,nr->nd", wJ[s], bvec)
                g = g.at[idxs[s]].add(gi)
                Hii = jnp.einsum("nri,nrj->nij", wJ[s], wJ[s])
                d = Hii.shape[-1]
                Hii = jnp.pad(Hii, ((0, 0), (0, dmax - d), (0, dmax - d)))
                var_rows = np.asarray([off_to_var[int(o)]
                                       for o in st.col_offsets[s]])
                diag = diag.at[var_rows].add(Hii)
        # identity on padding
        pad = np.zeros((nv, dmax))
        for i in range(nv):
            pad[i, var_dims[i]:] = 1.0
        diag = diag + jax.vmap(jnp.diag)(jnp.asarray(pad, dtype=diag.dtype))
        return (lin, g, diag)

    def _matvec(self, lin, v, lam):
        out = lam * v
        for (wJ, _b), idxs, bt in zip(lin, self._slot_idx,
                                      self._bound.graph.batches):
            u = None
            for s in range(bt.arity):
                us = jnp.einsum("nrd,nd->nr", wJ[s], v[idxs[s]])
                u = us if u is None else u + us
            for s in range(bt.arity):
                out = out.at[idxs[s]].add(jnp.einsum("nrd,nr->nd", wJ[s], u))
        return out

    def solve(self, system, lam, diagonal_damping):
        lin, g, diag = system
        offsets, var_dims, dmax = self._nvar_offsets, self._var_dims, self._dmax
        dt = g.dtype
        # damped preconditioner inverse
        Minv = jnp.linalg.inv(diag + lam * jnp.eye(dmax, dtype=dt))

        idx = jnp.asarray(offsets[:, None] + np.arange(dmax)[None, :])
        valid = jnp.asarray(
            np.arange(dmax)[None, :] < np.asarray(var_dims)[:, None])
        idx_safe = jnp.where(valid, idx, 0)

        def apply_Minv(r):
            rblk = jnp.where(valid, r[idx_safe], 0.0)
            z = jnp.einsum("nij,nj->ni", Minv, rblk)
            return jnp.zeros_like(r).at[idx_safe].add(jnp.where(valid, z, 0.0))

        def matvec(v):
            return self._matvec(lin, v, lam)

        x0 = jnp.zeros_like(g)
        r0 = g
        z0 = apply_Minv(r0)
        p0 = z0
        gamma0 = r0 @ z0
        tol2 = self.tol ** 2 * jnp.maximum(g @ g, 1e-300)

        def cond(state):
            _x, r, _z, _p, _gamma, it = state
            return (r @ r > tol2) & (it < self.max_iterations)

        def body(state):
            x, r, z, p, gamma, it = state
            Ap = matvec(p)
            alpha = gamma / jnp.maximum(p @ Ap, 1e-300)
            x = x + alpha * p
            r = r - alpha * Ap
            z = apply_Minv(r)
            gamma_new = r @ z
            beta = gamma_new / jnp.maximum(gamma, 1e-300)
            p = z + beta * p
            return (x, r, z, p, gamma_new, it + 1)

        x, r, _z, _p, _gamma, it = jax.lax.while_loop(
            cond, body, (x0, r0, z0, p0, gamma0, jnp.zeros((), jnp.int32)))
        return x


class SubgraphPCGSolver(PCGSolver):
    """PCG preconditioned by a spanning-tree subgraph solve.

    Reference: gtsam/linear/SubgraphSolver.h:76, SubgraphPreconditioner.h:54,
    SubgraphBuilder — the classic 'solve the tree by elimination, CG on the
    rest' combinatorial preconditioner.  The tree system factorizes with the
    level-scheduled sparse solver (fill-free on trees).
    """

    def bind(self, bound):
        super().bind(bound)
        from ..base.dsf import DSF
        from ..graph import factors as factors_mod
        from ..graph.graph import BoundGraph
        from .sparse import SparseCholeskySolver

        # spanning structure: all unary rows + binary rows joining components
        nvar = len(self._nvar_offsets)
        off_to_var = {int(o): i for i, o in enumerate(self._nvar_offsets)}
        dsf = DSF(nvar)
        tree_rows = []
        for bi, (b, st) in enumerate(zip(bound.graph.batches, bound.structures)):
            if b.arity == 1:
                tree_rows.append((bi, np.arange(b.num_factors)))
                continue
            rows = []
            v0 = np.asarray([off_to_var[int(o)] for o in st.col_offsets[0]])
            v1 = np.asarray([off_to_var[int(o)] for o in st.col_offsets[1]])
            for n in range(b.num_factors):
                if dsf.find(int(v0[n])) != dsf.find(int(v1[n])):
                    dsf.union(int(v0[n]), int(v1[n]))
                    rows.append(n)
            if rows:
                tree_rows.append((bi, np.asarray(rows)))

        from ..graph.graph import FactorGraph
        tree_batches = [factors_mod.slice_batch(bound.graph.batches[bi], rows)
                        for bi, rows in tree_rows]
        tree_graph = FactorGraph(tree_batches)
        tree_bound = BoundGraph.__new__(BoundGraph)
        tree_bound.graph = tree_graph
        tree_bound.layout = bound.layout
        from ..graph.graph import _BatchStructure
        tree_bound.structures = [
            _BatchStructure(
                tuple(st.rows[s][rows] for s in range(b.arity)),
                tuple(st.col_offsets[s][rows] for s in range(b.arity)))
            for (bi, rows), b, st in zip(
                tree_rows,
                tree_batches,
                [bound.structures[bi] for bi, _ in tree_rows])
        ]
        self._tree = SparseCholeskySolver(tree_bound)
        return self

    def system(self, arrays):
        lin, g, diag = super().system(arrays)
        tree_blocks, _tg = self._tree.system(arrays)
        tree_fact = self._tree.factorize(tree_blocks, 1e-8)
        return (lin, g, diag, tree_fact)

    def solve(self, system, lam, diagonal_damping):
        lin, g, diag, tree_fact = system

        def apply_Minv(r):
            return self._tree.solve_factored(tree_fact, self._tree_pad(r))

        def matvec(v):
            return self._matvec(lin, v, lam)

        x0 = jnp.zeros_like(g)
        r0 = g
        z0 = apply_Minv(r0)
        p0 = z0
        gamma0 = r0 @ z0
        tol2 = self.tol ** 2 * jnp.maximum(g @ g, 1e-300)

        def cond(state):
            _x, r, _z, _p, _gamma, it = state
            return (r @ r > tol2) & (it < self.max_iterations)

        def body(state):
            x, r, z, p, gamma, it = state
            Ap = matvec(p)
            alpha = gamma / jnp.maximum(p @ Ap, 1e-300)
            x = x + alpha * p
            r = r - alpha * Ap
            z = apply_Minv(r)
            gamma_new = r @ z
            beta = gamma_new / jnp.maximum(gamma, 1e-300)
            p = z + beta * p
            return (x, r, z, p, gamma_new, it + 1)

        x, *_ = jax.lax.while_loop(
            cond, body, (x0, r0, z0, p0, gamma0, jnp.zeros((), jnp.int32)))
        return x

    def _tree_pad(self, flat_g):
        """Canonical flat vector -> tree solver's permuted padded layout."""
        s = self._tree
        g = jnp.zeros((s.nvars, s.d), dtype=flat_g.dtype)
        for dim in np.unique(s.var_dims):
            sel = np.where(s.var_dims == dim)[0]
            offs = s.var_offsets[sel]
            idx = offs[:, None] + np.arange(dim)[None, :]
            g = g.at[s.sym.inv_perm[sel], :dim].set(flat_g[idx])
        return g
