"""ISAM2-style incremental smoothing and mapping.

Reference: gtsam/nonlinear/ISAM2.{h,cpp} — Bayes-tree-resident incremental
updates with fluid relinearization (ISAM2.h:45, update:400, recalculate:116,
updateDelta:724), ISAM2Params (relinearizeThreshold/Skip, ISAM2Params.h:136).

TPU-native design stance (round 1): the reference's pointer-level Bayes-tree
surgery exists to avoid re-eliminating on a CPU where elimination is expensive.
Here the full level-scheduled block factorization is a handful of fused batched
device kernels, so each update re-solves the FULL linear system at the current
linearization points — while keeping GTSAM's *semantics*: a persistent
linearization point Values, a delta vector, and the fluid relinearization
policy (only variables whose delta exceeds relinearize_threshold get their
linearization point moved, every relinearize_skip updates).  This preserves the
reference's defining oracle (incremental == batch at the same linearization
points) by construction.  Incremental symbolic reuse + wildfire thresholds are
planned optimizations on the same API.
"""

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import factors as factors_mod
from ..graph import manifolds
from ..graph.graph import FactorGraph
from ..graph.values import Values, retract_arrays
from ..utils.debug import debug_print


@dataclasses.dataclass
class ISAM2Params:
    relinearize_threshold: float = 0.1
    relinearize_skip: int = 10
    enable_relinearization: bool = True
    solver: str = "auto"      # "dense" | "sparse" | "auto"
    sparse_threshold: int = 200   # switch to sparse above this many variables
    # compute error_before/error_after in results (enableDetailedResults analog;
    # two extra device evaluations per update when on)
    evaluate_nonlinear_error: bool = True


@dataclasses.dataclass
class ISAM2Result:
    error_before: float
    error_after: float
    variables_relinearized: int
    factors_total: int


class ISAM2:
    def __init__(self, params: Optional[ISAM2Params] = None):
        self.params = params or ISAM2Params()
        self.graph = FactorGraph()
        self.lin_point: Optional[Values] = None
        self.delta: Optional[jnp.ndarray] = None
        self.update_count = 0
        self._solver = None
        self._bound = None
        self._structure_dirty = True

    # -- public API --------------------------------------------------------

    def update(self, new_batches: Sequence[factors_mod.FactorBatch] = (),
               new_entries: Sequence[Tuple] = (),
               force_relinearize: bool = False) -> ISAM2Result:
        """Add factors/variables, update the solution (ISAM2::update analog)."""
        if new_batches or new_entries:
            self._structure_dirty = True
        for b in new_batches:
            self.graph.add(b)
        if new_entries:
            self._extend_values(new_entries)
        assert self.lin_point is not None, "no variables yet"

        self.update_count += 1
        relin_count = 0
        if (self.params.enable_relinearization and self.delta is not None
                and (force_relinearize
                     or self.update_count % self.params.relinearize_skip == 0)):
            relin_count = self._relinearize()
        debug_print("ISAM2 update",
                    f"update {self.update_count}: {self.graph.num_factors} "
                    f"factors, relinearized {relin_count} keys, "
                    f"structure_dirty={self._structure_dirty}")

        self._ensure_solver()
        if self.params.evaluate_nonlinear_error:
            err_before = float(self._error_impl(self.lin_point.arrays))
        else:
            err_before = float("nan")
        self.delta = self._solve()
        if self.params.evaluate_nonlinear_error:
            est = self.calculate_estimate()
            # same graph + same key layout: the cached bound structure applies
            err_after = float(self._error_impl(est.arrays))
        else:
            err_after = float("nan")
        return ISAM2Result(err_before, err_after, relin_count,
                           self.graph.num_factors)

    def calculate_estimate(self) -> Values:
        if self.delta is None:
            return self.lin_point
        return self.lin_point.retract(self.delta)

    def marginal_covariance(self, key):
        from .marginals import Marginals
        return Marginals(self.graph, self.calculate_estimate()).marginal_covariance(key)

    # -- internals ---------------------------------------------------------

    def _extend_values(self, entries):
        new_vals = Values.from_entries(entries)
        if self.lin_point is None:
            self.lin_point = new_vals
            return
        old = self.lin_point
        old_layout = old.layout()
        arrays, keys = {}, {}
        for t in sorted(set(old.arrays) | set(new_vals.arrays)):
            if t in old.arrays and t in new_vals.arrays:
                arrays[t] = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b]),
                    old.arrays[t], new_vals.arrays[t])
                keys[t] = np.concatenate([old.keys[t], new_vals.keys[t]])
            elif t in old.arrays:
                arrays[t], keys[t] = old.arrays[t], old.keys[t]
            else:
                arrays[t], keys[t] = new_vals.arrays[t], new_vals.keys[t]
        self.lin_point = Values(arrays, keys)
        # remap delta into the new layout (old rows keep their values; new zero)
        if self.delta is not None:
            new_layout = self.lin_point.layout()
            nd = jnp.zeros(new_layout.total_dim, dtype=self.delta.dtype)
            for t in old_layout.type_order:
                d = manifolds.get(t).dim
                n_old = len(old_layout.offsets[t])
                oi = old_layout.offsets[t][:, None] + np.arange(d)[None, :]
                ni = new_layout.offsets[t][:n_old, None] + np.arange(d)[None, :]
                nd = nd.at[ni.reshape(-1)].set(self.delta[oi.reshape(-1)])
            self.delta = nd

    def _ensure_solver(self):
        if not self._structure_dirty and self._solver is not None:
            return
        self._bound = self.graph.bind(self.lin_point)
        n = len(self.lin_point)
        use_sparse = (self.params.solver == "sparse"
                      or (self.params.solver == "auto"
                          and n > self.params.sparse_threshold))
        if use_sparse:
            from ..linear.sparse import SparseCholeskySolver
            self._solver = SparseCholeskySolver(self._bound)
            self._solve_impl = jax.jit(
                lambda arrays: self._solver.solve(arrays, 1e-10))
        else:
            bound = self._bound

            def dense_solve(arrays):
                H, g = bound.gn_system(arrays)
                Hd = H + 1e-10 * jnp.eye(H.shape[0], dtype=H.dtype)
                L = jnp.linalg.cholesky(Hd)
                return jax.scipy.linalg.cho_solve((L, True), g)

            self._solve_impl = jax.jit(dense_solve)
        bound = self._bound
        self._error_impl = jax.jit(lambda arrays: bound.error(arrays))
        self._structure_dirty = False

    def _solve(self):
        return self._solve_impl(self.lin_point.arrays)

    def _relinearize(self) -> int:
        """Move linearization points of variables with |delta| > threshold
        (CheckRelinearizationPartial analog); zero their delta."""
        if self.delta is None:
            return 0
        lay = self.lin_point.layout()
        thresh = self.params.relinearize_threshold
        mask = jnp.zeros_like(self.delta)
        count = 0
        for t in lay.type_order:
            d = manifolds.get(t).dim
            idx = lay.offsets[t][:, None] + np.arange(d)[None, :]
            dt_ = self.delta[idx]  # (N_t, d)
            relin = jnp.max(jnp.abs(dt_), axis=1) > thresh
            count += int(relin.sum())
            mask = mask.at[idx.reshape(-1)].set(
                jnp.repeat(relin, d).astype(self.delta.dtype))
        if count == 0:
            return 0
        # retract only the relin vars; keep others' linearization points
        partial_delta = self.delta * mask
        self.lin_point = self.lin_point.retract(partial_delta)
        self.delta = self.delta * (1.0 - mask)
        return count
