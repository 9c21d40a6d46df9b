"""IncrementalSmoother: the compile-free ISAM2 runtime.

The semantic ISAM2 (isam2.py) re-plans per structural change, which costs a
retrace+compile per update under XLA.  This runtime is the TPU-native answer
(SURVEY.md §7 'capacity-padded buffers + recompile-on-overflow'):

  - factors merge into per-type CAPACITY-PADDED stores (padding rows carry
    zero noise weight: they linearize to exactly zero contribution)
  - variables pad to per-type capacities (padding rows = copies of row 0)
  - graph STRUCTURE (gather rows, scatter offsets, masks) enters the jitted
    solve as RUNTIME ARGUMENTS, not baked constants

so one XLA executable serves every update until a capacity doubles — the
per-update cost is one device solve plus O(new factors) host bookkeeping.
Dense Cholesky path (right for the online window sizes this targets; the
sparse planner remains available through the semantic ISAM2).
"""

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..graph import factors as factors_mod
from ..graph import manifolds
from ..graph.values import Values


def _next_pow2(n):
    c = 8
    while c < n:
        c *= 2
    return c


@dataclasses.dataclass
class _Store:
    """One padded factor group (shared residual_fn + var_types + noise kind)."""

    batch: factors_mod.FactorBatch      # padded template (residual_fn, types)
    cap: int
    n: int
    keys: np.ndarray                    # (cap, arity) int64
    meas: object                        # pytree, leading dim cap
    R: jnp.ndarray                      # (cap, rdim, rdim) whitening matrices


class IncrementalSmoother:
    def __init__(self, relinearize_threshold: float = 0.1,
                 relinearize_skip: int = 1, damping: float = 1e-9):
        self.relinearize_threshold = relinearize_threshold
        self.relinearize_skip = relinearize_skip
        self.damping = damping
        self.stores: List[_Store] = []
        self._store_of: Dict[tuple, int] = {}
        # padded values
        self.types: List[str] = []
        self.var_cap: Dict[str, int] = {}
        self.var_n: Dict[str, int] = {}
        self.arrays: Dict[str, object] = {}
        self.keys: Dict[str, List[int]] = {}
        self._key_index: Dict[int, Tuple[str, int]] = {}
        self.delta: Optional[jnp.ndarray] = None
        self.update_count = 0
        self._solve_cache: Dict[tuple, callable] = {}

    # -- values ------------------------------------------------------------

    def _add_value(self, key, tname, val):
        if int(key) in self._key_index:
            return
        if tname not in self.var_cap:
            self.types = sorted(set(self.types) | {tname})
            self.var_cap[tname] = 8
            self.var_n[tname] = 0
            self.arrays[tname] = jax.tree.map(
                lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                           (8,) + jnp.asarray(a).shape).copy(),
                val)
            self.keys[tname] = []
        n = self.var_n[tname]
        if n >= self.var_cap[tname]:
            new_cap = self.var_cap[tname] * 2
            self.arrays[tname] = jax.tree.map(
                lambda a: jnp.concatenate([a, a[:self.var_cap[tname]]]),
                self.arrays[tname])
            self.var_cap[tname] = new_cap
        self.arrays[tname] = jax.tree.map(
            lambda a, v: a.at[n].set(jnp.asarray(v)), self.arrays[tname], val)
        self.keys[tname].append(int(key))
        self._key_index[int(key)] = (tname, n)
        self.var_n[tname] = n + 1

    # -- factors -----------------------------------------------------------

    def _noise_R(self, batch) -> jnp.ndarray:
        """Per-factor whitening matrices (rdim, rdim) — uniform representation
        so stores can merge heterogeneous diagonal/isotropic/full noises."""
        nz = batch.noise
        r = batch.rdim
        n = batch.num_factors
        if nz.kind == "unit":
            return jnp.broadcast_to(jnp.eye(r), (n, r, r))
        if nz.kind in ("diagonal", "constrained"):
            # 'constrained' data is (N, rdim) inverse sigmas with 0 on hard
            # rows — same diagonal-whitening semantics as the soft rows (the
            # incremental runtime has no KKT path; hard rows are dropped,
            # matching SparseSolver's soft-row treatment).
            d = jnp.broadcast_to(nz.data, (n, r))
            return jax.vmap(jnp.diag)(d)
        return jnp.broadcast_to(nz.data, (n, r, r))

    def _add_factors(self, batch: factors_mod.FactorBatch):
        sig = (batch.residual_fn, batch.var_types, batch.rdim)
        R_new = self._noise_R(batch)
        if sig not in self._store_of:
            cap = _next_pow2(batch.num_factors)
            pad = cap - batch.num_factors
            keys = np.concatenate(
                [batch.keys, np.tile(batch.keys[:1], (pad, 1))])
            meas = jax.tree.map(
                lambda a: jnp.concatenate(
                    [jnp.asarray(a),
                     jnp.broadcast_to(jnp.asarray(a)[:1],
                                      (pad,) + jnp.asarray(a).shape[1:])]),
                batch.measurements)
            R = jnp.concatenate([R_new, jnp.zeros((pad,) + R_new.shape[1:])])
            self._store_of[sig] = len(self.stores)
            self.stores.append(_Store(batch, cap, batch.num_factors, keys,
                                      meas, R))
            return
        st = self.stores[self._store_of[sig]]
        need = st.n + batch.num_factors
        if need > st.cap:
            new_cap = _next_pow2(need)
            grow = new_cap - st.cap
            st.keys = np.concatenate([st.keys, np.tile(st.keys[:1], (grow, 1))])
            st.meas = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (grow,) + a.shape[1:])]),
                st.meas)
            st.R = jnp.concatenate(
                [st.R, jnp.zeros((grow,) + st.R.shape[1:])])
            st.cap = new_cap
        sl = slice(st.n, st.n + batch.num_factors)
        st.keys[sl] = batch.keys
        idx = jnp.arange(st.n, st.n + batch.num_factors)
        st.meas = jax.tree.map(
            lambda a, b: a.at[idx].set(jnp.asarray(b)), st.meas,
            batch.measurements)
        st.R = st.R.at[idx].set(R_new)
        st.n += batch.num_factors

    # -- solve -------------------------------------------------------------

    def _layout(self):
        offsets = {}
        base = 0
        for t in self.types:
            d = manifolds.get(t).dim
            offsets[t] = base
            base += self.var_cap[t] * d
        return offsets, base

    def _structure_args(self):
        offsets, D = self._layout()
        per_store = []
        for st in self.stores:
            rows, offs = [], []
            for s, t in enumerate(st.batch.var_types):
                r = np.asarray([self._key_index[int(k)][1]
                                for k in st.keys[:, s]], dtype=np.int32)
                rows.append(r)
                d = manifolds.get(t).dim
                offs.append(offsets[t] + r * d)
            per_store.append((st.meas, st.R,
                              tuple(jnp.asarray(x) for x in rows),
                              tuple(jnp.asarray(x) for x in offs)))
        # active-dim mask: 1.0 where a real variable owns the dim
        mask = np.zeros(D)
        for t in self.types:
            d = manifolds.get(t).dim
            mask[offsets[t]:offsets[t] + self.var_n[t] * d] = 1.0
        return per_store, jnp.asarray(mask), D

    def _solver_fn(self, D):
        """One jitted solve per (store shapes, D) signature."""
        store_meta = tuple((st.batch.residual_fn, st.batch.var_types,
                            st.batch.rdim, st.cap) for st in self.stores)
        key = (store_meta, D, tuple(sorted(self.var_cap.items())))
        if key in self._solve_cache:
            return self._solve_cache[key]

        metas = [(st.batch, st.batch.var_types) for st in self.stores]
        damping = self.damping

        @jax.jit
        def solve(arrays, per_store, mask):
            dt = _default_dtype()
            H = jnp.zeros((D, D), dtype=dt)
            g = jnp.zeros(D, dtype=dt)
            for (batch, types), (meas, R, rows, offs) in zip(metas, per_store):
                xs = tuple(jax.tree.map(lambda a: a[rows[s]], arrays[t])
                           for s, t in enumerate(types))
                dims = batch.dims()
                retracts = tuple(manifolds.get(t).retract for t in types)

                def res_tangent(deltas, xs_one, meas_one):
                    xs_p = tuple(r(x, d) for r, x, d in
                                 zip(retracts, xs_one, deltas))
                    return batch.residual_fn(xs_p, meas_one)

                def one(xs_one, meas_one):
                    zeros = tuple(jnp.zeros(d, dtype=dt) for d in dims)
                    J = jax.jacfwd(res_tangent)(zeros, xs_one, meas_one)
                    r = res_tangent(zeros, xs_one, meas_one)
                    return J, r

                J, r = jax.vmap(one)(xs, meas)
                wJ = tuple(jnp.einsum("nij,njd->nid", R, Ji) for Ji in J)
                wr = jnp.einsum("nij,nj->ni", R, r)
                for i in range(len(types)):
                    gi = -jnp.einsum("nrd,nr->nd", wJ[i], wr)
                    gidx = offs[i][:, None] + np.arange(dims[i])[None, :]
                    g = g.at[gidx].add(gi)
                    for jj in range(i, len(types)):
                        Hij = jnp.einsum("nri,nrj->nij", wJ[i], wJ[jj])
                        ridx = (offs[i][:, None, None]
                                + np.arange(dims[i])[None, :, None])
                        cidx = (offs[jj][:, None, None]
                                + np.arange(dims[jj])[None, None, :])
                        H = H.at[ridx, cidx].add(Hij)
                        if jj > i:
                            H = H.at[jnp.swapaxes(cidx, 1, 2),
                                     jnp.swapaxes(ridx, 1, 2)].add(
                                jnp.swapaxes(Hij, 1, 2))
            # inactive dims: identity rows (solution forced to zero)
            H = H + jnp.diag(1.0 - mask) + damping * jnp.eye(D, dtype=dt)
            g = g * mask
            L = jnp.linalg.cholesky(H)
            return jax.scipy.linalg.cho_solve((L, True), g)

        self._solve_cache[key] = solve
        return solve

    # -- public API --------------------------------------------------------

    def update(self, new_batches=(), new_entries=()):
        for (k, t, v) in new_entries:
            self._add_value(k, t, v)
        for b in new_batches:
            self._add_factors(b)
        self.update_count += 1
        per_store, mask, D = self._structure_args()
        solve = self._solver_fn(D)
        self.delta = solve(self.arrays, per_store, mask)
        if self.update_count % self.relinearize_skip == 0:
            self._relinearize(mask, D)
        return self.delta

    def _relinearize(self, mask, D):
        """Move lin points for vars with |delta| above threshold (fluid relin)."""
        offsets, _D = self._layout()
        new_arrays = dict(self.arrays)
        for t in self.types:
            d = manifolds.get(t).dim
            cap = self.var_cap[t]
            idx = offsets[t] + np.arange(cap)[:, None] * d + np.arange(d)[None, :]
            dt_ = self.delta[idx]
            relin = jnp.max(jnp.abs(dt_), axis=1) > self.relinearize_threshold
            dt_m = dt_ * relin[:, None]
            new_arrays[t] = jax.vmap(manifolds.get(t).retract)(
                self.arrays[t], dt_m)
            self.delta = self.delta.at[idx.reshape(-1)].set(
                (dt_ * (1.0 - relin[:, None])).reshape(-1))
        self.arrays = new_arrays

    def calculate_estimate(self) -> Values:
        offsets, _D = self._layout()
        entries = []
        for t in self.types:
            d = manifolds.get(t).dim
            n = self.var_n[t]
            idx = offsets[t] + np.arange(n)[:, None] * d + np.arange(d)[None, :]
            dt_ = self.delta[idx] if self.delta is not None else jnp.zeros((n, d))
            vals = jax.tree.map(lambda a: a[:n], self.arrays[t])
            vals = jax.vmap(manifolds.get(t).retract)(vals, dt_)
            for row, k in enumerate(self.keys[t]):
                entries.append((k, t, jax.tree.map(lambda a: a[row], vals)))
        return Values.from_entries(entries)

    def estimate_of(self, key):
        t, row = self._key_index[int(key)]
        offsets, _D = self._layout()
        d = manifolds.get(t).dim
        idx = offsets[t] + row * d + np.arange(d)
        dt_ = self.delta[idx] if self.delta is not None else jnp.zeros(d)
        x = jax.tree.map(lambda a: a[row], self.arrays[t])
        return manifolds.get(t).retract(x, dt_)
