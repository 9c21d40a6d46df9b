"""Fixed-lag smoothing with marginalization.

Reference: gtsam/nonlinear/FixedLagSmoother.h:33 (timestamp->key bookkeeping),
BatchFixedLagSmoother.h:29 (LM + marginalization of old keys),
LinearContainerFactor (wraps a linear factor into a nonlinear graph).

Marginalization: the dropped variables' information is Schur-complemented onto
their boundary (separator) variables and re-inserted as a linear-container
factor — a fixed whitened Jacobian over tangent deviations from the stored
linearization points (the marginalizeLeaves -> dense prior pattern, ISAM2.h:199).
"""

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import factors as factors_mod
from ..graph import manifolds
from ..graph.graph import FactorGraph
from ..graph.values import Values
from ..base import noise as noise_mod
from ..optimize import optimizers as opt_mod


def linear_container_factor(keys, types, lin_points, R, rhs) -> factors_mod.FactorBatch:
    """Factor with fixed whitened Jacobian: r(x) = R @ concat(local(lp_i, x_i)) - rhs."""
    types = tuple(types)
    dims = [manifolds.get(t).dim for t in types]

    def fn(xs, meas):
        Rm, rv, lps = meas
        deltas = [manifolds.get(t).local(lp, x)
                  for t, lp, x in zip(types, lps, xs)]
        return Rm @ jnp.concatenate(deltas) - rv

    meas = (jnp.asarray(R)[None], jnp.asarray(rhs)[None],
            tuple(jax.tree.map(lambda a: a[None], lp) for lp in lin_points))
    return factors_mod.FactorBatch(
        "LinearContainer", types, np.asarray(keys).reshape(1, -1),
        R.shape[0], fn, meas, noise_mod.unit())


def marginalize(graph: FactorGraph, values: Values, drop_keys: Sequence[int]
                ) -> FactorGraph:
    """Return a new graph with drop_keys marginalized out (Schur complement)."""
    drop = set(int(k) for k in drop_keys)
    keep_batches, affected = [], []
    for b in graph.batches:
        if any(int(k) in drop for k in b.keys.reshape(-1)):
            affected.append(b)
        else:
            keep_batches.append(b)
    if not affected:
        return FactorGraph(keep_batches)

    # boundary = non-dropped keys of affected factors
    boundary: List[int] = []
    for b in affected:
        for k in b.keys.reshape(-1):
            if int(k) not in drop and int(k) not in boundary:
                boundary.append(int(k))
    sub = FactorGraph(affected)
    sub_vals_entries = []
    for k in sorted(drop) + boundary:
        t = values.type_of(k)
        sub_vals_entries.append((k, t, values.at(k)))
    sub_values = Values.from_entries(sub_vals_entries)
    bound = sub.bind(sub_values)
    H, g = bound.gn_system(sub_values.arrays)
    lay = sub_values.layout()

    def var_slice(k):
        t = sub_values.type_of(k)
        off = int(lay.offsets[t][sub_values.row_of(k)])
        return off, manifolds.get(t).dim

    d_idx = np.concatenate([np.arange(*(lambda o, d: (o, o + d))(*var_slice(k)))
                            for k in sorted(drop)])
    b_idx = np.concatenate([np.arange(*(lambda o, d: (o, o + d))(*var_slice(k)))
                            for k in boundary])
    H = np.asarray(H)
    g = np.asarray(g)
    Hdd = H[np.ix_(d_idx, d_idx)] + 1e-12 * np.eye(len(d_idx))
    Hdb = H[np.ix_(d_idx, b_idx)]
    Hbb = H[np.ix_(b_idx, b_idx)]
    gd = g[d_idx]
    gb = g[b_idx]
    S = Hbb - Hdb.T @ np.linalg.solve(Hdd, Hdb)
    gs = gb - Hdb.T @ np.linalg.solve(Hdd, gd)
    # S may be PSD-singular (gauge); add tiny jitter for the Cholesky
    w, V = np.linalg.eigh(S)
    w = np.maximum(w, 1e-10)
    R = (V * np.sqrt(w)) @ V.T          # symmetric square root
    rhs = np.linalg.solve(R, gs)
    lin_points = [values.at(k) for k in boundary]
    types = [values.type_of(k) for k in boundary]
    out = FactorGraph(keep_batches)
    out.add(linear_container_factor(boundary, types, lin_points, R, rhs))
    return out


@dataclasses.dataclass
class FixedLagParams:
    lag: float = 5.0
    lm: Optional[opt_mod.LMParams] = None


class BatchFixedLagSmoother:
    """BatchFixedLagSmoother analog: LM + marginalization of out-of-lag keys."""

    def __init__(self, params: Optional[FixedLagParams] = None):
        self.params = params or FixedLagParams()
        self.graph = FactorGraph()
        self.values: Optional[Values] = None
        self.timestamps: Dict[int, float] = {}

    def update(self, new_batches=(), new_entries=(),
               new_timestamps: Optional[Dict[int, float]] = None):
        for b in new_batches:
            self.graph.add(b)
        if new_entries:
            vals_new = Values.from_entries(new_entries)
            if self.values is None:
                self.values = vals_new
            else:
                arrays, keys = {}, {}
                for t in sorted(set(self.values.arrays) | set(vals_new.arrays)):
                    if t in self.values.arrays and t in vals_new.arrays:
                        arrays[t] = jax.tree.map(
                            lambda a, b: jnp.concatenate([a, b]),
                            self.values.arrays[t], vals_new.arrays[t])
                        keys[t] = np.concatenate(
                            [self.values.keys[t], vals_new.keys[t]])
                    elif t in self.values.arrays:
                        arrays[t] = self.values.arrays[t]
                        keys[t] = self.values.keys[t]
                    else:
                        arrays[t] = vals_new.arrays[t]
                        keys[t] = vals_new.keys[t]
                self.values = Values(arrays, keys)
        self.timestamps.update(new_timestamps or {})

        # optimize
        res = opt_mod.levenberg_marquardt(
            self.graph, self.values, self.params.lm or opt_mod.LMParams())
        self.values = res.values

        # marginalize out-of-lag variables
        if self.timestamps:
            tmax = max(self.timestamps.values())
            old = [k for k, ts in self.timestamps.items()
                   if ts < tmax - self.params.lag]
            if old:
                self.graph = marginalize(self.graph, self.values, old)
                self._remove_values(old)
                for k in old:
                    del self.timestamps[k]
        return res

    def _remove_values(self, keys):
        drop = set(int(k) for k in keys)
        arrays, kept = {}, {}
        for t, ks in self.values.keys.items():
            mask = np.asarray([int(k) not in drop for k in ks])
            if mask.any():
                arrays[t] = jax.tree.map(lambda a: a[np.where(mask)[0]],
                                         self.values.arrays[t])
                kept[t] = ks[mask]
        self.values = Values(arrays, kept)

    def calculate_estimate(self) -> Values:
        return self.values


class IncrementalFixedLagSmoother:
    """ISAM2-based fixed-lag smoother.

    Reference: gtsam_unstable/nonlinear/IncrementalFixedLagSmoother.{h,cpp} —
    iSAM2 update with out-of-lag keys marginalized into dense prior factors
    (ISAM2::marginalizeLeaves analog).  Here marginalization is the same
    Schur-complement → LinearContainer path as the batch smoother, applied to
    the ISAM2-resident graph at its current linearization point.
    """

    def __init__(self, params: Optional[FixedLagParams] = None,
                 isam_params=None):
        from .isam2 import ISAM2, ISAM2Params
        self.params = params or FixedLagParams()
        self.isam = ISAM2(isam_params or ISAM2Params(relinearize_skip=1))
        self.timestamps: Dict[int, float] = {}

    def update(self, new_batches=(), new_entries=(),
               new_timestamps: Optional[Dict[int, float]] = None):
        res = self.isam.update(new_batches, new_entries)
        self.timestamps.update(new_timestamps or {})
        if self.timestamps:
            tmax = max(self.timestamps.values())
            old = [k for k, ts in self.timestamps.items()
                   if ts < tmax - self.params.lag]
            if old:
                self._marginalize(old)
        return res

    def _marginalize(self, old_keys):
        """Fold out-of-lag keys into a linear container on the boundary."""
        isam = self.isam
        # marginalize at the CURRENT estimate so the cached delta stays valid
        est = isam.calculate_estimate()
        isam.graph = marginalize(isam.graph, est, old_keys)
        drop = set(int(k) for k in old_keys)
        arrays, kept = {}, {}
        for t, ks in est.keys.items():
            mask = np.asarray([int(k) not in drop for k in ks])
            if mask.any():
                arrays[t] = jax.tree.map(lambda a: a[np.where(mask)[0]],
                                         est.arrays[t])
                kept[t] = ks[mask]
        isam.lin_point = Values(arrays, kept)
        isam.delta = None
        isam._structure_dirty = True
        for k in old_keys:
            del self.timestamps[k]

    def calculate_estimate(self) -> Values:
        return self.isam.calculate_estimate()
