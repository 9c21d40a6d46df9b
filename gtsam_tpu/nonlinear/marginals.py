"""Marginal covariances from an optimized factor graph.

Reference: gtsam/nonlinear/Marginals.h:32 (marginalCovariance:114,
jointMarginalCovariance).  Dense information-matrix inverse for small/medium
graphs; per-key selected solves against the sparse factorization for large ones
(solve H X = E_key and read the key's rows).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import manifolds
from ..graph.graph import FactorGraph
from ..graph.values import Values


class Marginals:
    def __init__(self, graph: FactorGraph, values: Values, sparse: bool = False):
        self.values = values
        self.layout = values.layout()
        bound = graph.bind(values)
        if sparse:
            # supernodal solver (the production sparse path): batched padded
            # fronts, auto ordering — replaces the old per-variable level
            # schedule here (round-2 weak item: large-graph marginals were
            # inheriting the known-slow path)
            from ..linear.supernodal import SupernodalCholeskySolver
            self._solver = SupernodalCholeskySolver(bound)
            blocks, _g = self._solver.system(values.arrays)
            self._factored = self._solver.factorize(blocks, 0.0)
            self._H = None
        else:
            H, _ = jax.jit(bound.gn_system)(values.arrays)
            self._H = H
            # Cholesky-based SPD inverse: H is an information matrix, and
            # libtpu has no f64 LU expansion (jnp.linalg.inv fails to compile
            # on-device) while triangular solves lower fine at any dtype.
            L = jnp.linalg.cholesky(H)
            eye = jnp.eye(H.shape[0], dtype=H.dtype)
            Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            self._cov = Linv.T @ Linv
            self._solver = None

    def _slice(self, key):
        t = self.values.type_of(key)
        row = self.values.row_of(key)
        off = int(self.layout.offsets[t][row])
        dim = manifolds.get(t).dim
        return off, dim

    def _selected_columns(self, idx: np.ndarray) -> jnp.ndarray:
        """Columns idx of H^{-1} via ONE vmapped batched solve (the reference
        solves per column; on TPU the whole unit-vector batch rides a single
        level-scheduled back-substitution program)."""
        eye_cols = jnp.zeros((len(idx), self.layout.total_dim)
                             ).at[jnp.arange(len(idx)), jnp.asarray(idx)].set(1.0)
        gp = jax.vmap(self._solver.pack_rhs)(eye_cols)
        xs = jax.vmap(lambda g: self._solver.solve_factored(self._factored, g)
                      )(gp)                         # (n_idx, total_dim)
        return xs

    def marginal_covariance(self, key) -> jnp.ndarray:
        off, dim = self._slice(key)
        if self._solver is None:
            return self._cov[off:off + dim, off:off + dim]
        xs = self._selected_columns(np.arange(off, off + dim))
        return xs[:, off:off + dim].T

    def joint_marginal_covariance(self, keys: Sequence) -> jnp.ndarray:
        slices = [self._slice(k) for k in keys]
        idx = np.concatenate([np.arange(o, o + d) for o, d in slices])
        if self._solver is None:
            return self._cov[np.ix_(idx, idx)]
        xs = self._selected_columns(idx)
        return xs[:, jnp.asarray(idx)].T

    def marginal_information(self, key) -> jnp.ndarray:
        # host inverse: the block is tiny (manifold dim) and f64 LU does not
        # lower on libtpu
        return jnp.asarray(np.linalg.inv(
            np.asarray(self.marginal_covariance(key))))
