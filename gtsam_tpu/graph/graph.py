"""FactorGraph: a list of typed factor batches, and its bound (static) form.

The reference's NonlinearFactorGraph linearizes factor-by-factor with TBB
(gtsam/nonlinear/NonlinearFactorGraph.cpp:239-274).  Here `bind()` freezes the
graph structure against a Values' key table (host-side work done once), yielding
pure array->array functions suitable for jit: error, linearization, and dense
Gauss-Newton assembly (scatter-add of per-batch blocks into H, g).
"""

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from . import factors as factors_mod
from .values import Layout, Values


class FactorGraph:
    def __init__(self, batches: List[factors_mod.FactorBatch] = None):
        self.batches: List[factors_mod.FactorBatch] = list(batches or [])

    def add(self, batch: factors_mod.FactorBatch) -> "FactorGraph":
        self.batches.append(batch)
        return self

    @property
    def num_factors(self) -> int:
        return sum(b.num_factors for b in self.batches)

    def keys(self):
        out = set()
        for b in self.batches:
            out.update(int(k) for k in b.keys.reshape(-1))
        return out

    def astype(self, dtype) -> "FactorGraph":
        """Graph with measurement/noise floating leaves cast to `dtype`."""
        import dataclasses as _dc

        def cast(a):
            a = jnp.asarray(a)
            return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) \
                else a

        out = []
        for b in self.batches:
            meas = (jax.tree.map(cast, b.measurements)
                    if b.measurements is not None else None)
            nz = b.noise
            if nz is not None and nz.data is not None:
                nz = _dc.replace(nz, data=jax.tree.map(cast, nz.data))
            out.append(_dc.replace(b, measurements=meas, noise=nz))
        return FactorGraph(out)

    def error(self, values: Values):
        return self.bind(values).error(values.arrays)

    def bind(self, values: Values) -> "BoundGraph":
        return BoundGraph(self, values)


@dataclasses.dataclass(frozen=True)
class _BatchStructure:
    rows: Tuple[np.ndarray, ...]       # per slot: (N,) row index into type array
    col_offsets: Tuple[np.ndarray, ...]  # per slot: (N,) global column offset


class BoundGraph:
    """Graph structure frozen against a Values key table; methods are jit-safe."""

    def __init__(self, graph: FactorGraph, values: Values):
        self.graph = graph
        self.layout: Layout = values.layout()
        self.structures: List[_BatchStructure] = []
        for b in graph.batches:
            rows, offs = [], []
            for s, t in enumerate(b.var_types):
                r = values.rows_of(t, b.keys[:, s])
                rows.append(r)
                offs.append(self.layout.offsets[t][r])
            self.structures.append(_BatchStructure(tuple(rows), tuple(offs)))
        # hard (sigma == 0) rows of 'constrained' noise models become exact
        # equality constraints C dx = c, eliminated by the dense solver's KKT
        # path (reference constraint-aware QR, NoiseModel.h:260)
        self._constraints = []  # (batch_idx, n_idx, r_idx, row0) host-side
        nc = 0
        for bi, b in enumerate(graph.batches):
            if b.noise.kind != "constrained":
                continue
            if b.linearize_fn is not None:
                raise NotImplementedError(
                    "constrained noise requires the autodiff linearize path")
            data = np.asarray(b.noise.data)
            mask = np.broadcast_to(data == 0, (b.num_factors, b.rdim))
            n_idx, r_idx = np.nonzero(mask)
            if len(n_idx):
                self._constraints.append(
                    (bi, n_idx.astype(np.int32), r_idx.astype(np.int32), nc))
                nc += len(n_idx)
        self.num_constraints = nc

    # -- pure functions over values.arrays --------------------------------

    def error(self, arrays):
        """Total graph error: sum of per-batch noise-model errors (chi2/2).

        Accumulated in f64 when x64 is live even if the working dtype is f32:
        at convergence the per-iteration decrement is below f32 sum noise,
        which would stall the LM accept test (cf. ba.py error_fn)."""
        acc_dt = (jnp.float64 if jax.config.jax_enable_x64
                  else _default_dtype())
        total = jnp.zeros((), dtype=acc_dt)
        for b, st in zip(self.graph.batches, self.structures):
            xs = tuple(
                jax.tree.map(lambda a: a[st.rows[s]], arrays[t])
                for s, t in enumerate(b.var_types)
            )
            r = factors_mod.residuals(b, xs)
            # cast the whitened residuals BEFORE the sum: the f32 reduction
            # inside noise.error is exactly the noise floor being avoided
            total = total + b.sign * b.noise.error(r.astype(acc_dt))
        return total

    def linearize(self, arrays):
        """Per-batch whitened (A, b) blocks; returns list of (wJ tuple, b)."""
        out = []
        for b, st in zip(self.graph.batches, self.structures):
            xs = tuple(
                jax.tree.map(lambda a: a[st.rows[s]], arrays[t])
                for s, t in enumerate(b.var_types)
            )
            out.append(factors_mod.linearize(b, xs))
        return out

    def gn_system(self, arrays):
        """Dense Gauss-Newton normal equations: returns (H, g).

        H = J^T J, g = J^T b (b = -whitened residual), both in the canonical
        tangent layout.  Reference analog: linearizeToHessianFactor
        (NonlinearFactorGraph.cpp:312) + Scatter assembly (HessianFactor.cpp:239).
        """
        D = self.layout.total_dim
        dt = _default_dtype()
        H = jnp.zeros((D, D), dtype=dt)
        g = jnp.zeros(D, dtype=dt)
        lin = self.linearize(arrays)
        for (wJ, bvec), bt, st in zip(lin, self.graph.batches, self.structures):
            dims = bt.dims()
            for i in range(bt.arity):
                gi = bt.sign * jnp.einsum("nrd,nr->nd", wJ[i], bvec)
                gidx = st.col_offsets[i][:, None] + np.arange(dims[i])[None, :]
                g = g.at[gidx].add(gi)
                for j in range(i, bt.arity):
                    Hij = bt.sign * jnp.einsum("nri,nrj->nij", wJ[i], wJ[j])
                    ridx = st.col_offsets[i][:, None, None] + np.arange(dims[i])[None, :, None]
                    cidx = st.col_offsets[j][:, None, None] + np.arange(dims[j])[None, None, :]
                    H = H.at[ridx, cidx].add(Hij)
                    if j > i:
                        H = H.at[jnp.swapaxes(cidx, 1, 2), jnp.swapaxes(ridx, 1, 2)].add(
                            jnp.swapaxes(Hij, 1, 2))
        return H, g

    def constraint_system(self, arrays):
        """Linearized hard constraints C dx = c from sigma == 0 rows.

        Returns (C: (Nc, D), c: (Nc,)) — the unwhitened Jacobian rows and
        negated residuals of the constrained rows.  Solvers append these to the
        GN system as a KKT block (equality-constrained least squares)."""
        D = self.layout.total_dim
        dt = _default_dtype()
        C = jnp.zeros((self.num_constraints, D), dtype=dt)
        c = jnp.zeros(self.num_constraints, dtype=dt)
        for (bi, n_idx, r_idx, row0) in self._constraints:
            b = self.graph.batches[bi]
            st = self.structures[bi]
            xs = tuple(
                jax.tree.map(lambda a: a[st.rows[s]], arrays[t])
                for s, t in enumerate(b.var_types)
            )
            J, r = factors_mod.linearize_raw(b, xs)
            rows = row0 + np.arange(len(n_idx))
            c = c.at[rows].set(-r[n_idx, r_idx].astype(dt))
            dims = b.dims()
            for i in range(b.arity):
                cols = (st.col_offsets[i][n_idx][:, None]
                        + np.arange(dims[i])[None, :])
                C = C.at[rows[:, None], cols].add(
                    J[i][n_idx, r_idx, :].astype(dt))
        return C, c

    def gradient(self, arrays):
        """Gradient of 0.5*chi2 at arrays (negative of g): autodiff-free."""
        _, g = self.gn_system(arrays)
        return -g
