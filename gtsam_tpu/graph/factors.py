"""Typed factor batches.

The reference dispatches a virtual linearize() per factor object
(gtsam/nonlinear/NonlinearFactor.h:296).  Here, ALL factors of one type form a
single FactorBatch: struct-of-arrays measurements + (N, arity) key table.  Error
is one vmapped residual; linearization is vmapped forward-mode autodiff of the
tangent-perturbed residual (the JAX-native replacement for both GTSAM's
hand-written evaluateError Jacobians and its Expression AD,
gtsam/nonlinear/Expression.h:47).  Analytic-Jacobian fast paths can be added
per-type later; autodiff of our analytic expmaps already yields the same values.

Each residual_fn has signature  (xs: tuple_of_elements, meas_row) -> (rdim,)
for a SINGLE factor; batching is the framework's job.
"""

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..base.noise import NoiseModel
from . import manifolds


@dataclasses.dataclass
class FactorBatch:
    name: str
    var_types: Tuple[str, ...]       # manifold type of each slot
    keys: np.ndarray                 # (N, arity) int64, host-side
    rdim: int
    residual_fn: Callable            # (xs, meas) -> (rdim,)
    measurements: Any                # pytree with leading dim N (or None)
    noise: NoiseModel
    # optional custom whitened linearization (smart factors etc.):
    # (xs_one, meas_one) -> (tuple of (rdim, d_i) jacobians, (rdim,) b)
    linearize_fn: Callable = None
    # +1.0 normally; -1.0 subtracts this batch's information (AntiFactor.h)
    sign: float = 1.0

    def __post_init__(self):
        self.keys = np.atleast_2d(np.asarray(self.keys, dtype=np.int64))

    @property
    def num_factors(self) -> int:
        return self.keys.shape[0]

    @property
    def arity(self) -> int:
        return self.keys.shape[1]

    def dims(self) -> Tuple[int, ...]:
        return tuple(manifolds.get(t).dim for t in self.var_types)


def _hi_dtype():
    """f64 when the mixed-precision policy is active (working dtype f32 with
    x64 live), else None.

    Residual FORWARD evaluation must run above the working precision: on
    sphere2500 the f32 forward pass carries ~1e-4 absolute noise on whitened
    residuals (compose/log over ~100-unit translations), which near
    convergence drowns both the chi2 accept test and the gradient rhs —
    measured as LM stalling at half-chi2 ~1139 with lambda inflating to 1,
    while the identical f64 run descends to 1133.  Jacobians stay f32 (their
    error enters only second-order)."""
    if jax.config.jax_enable_x64 and _default_dtype() == jnp.float32:
        return jnp.float64
    return None


def _upcast(tree, hi):
    def c(a):
        a = jnp.asarray(a)
        return a.astype(hi) if jnp.issubdtype(a.dtype, jnp.floating) else a
    return jax.tree.map(c, tree)


def residuals(batch: FactorBatch, xs, measurements=None):
    """Batched unwhitened residuals: xs = tuple of stacked elements per slot.

    Computed in f64 under the mixed-precision policy (see _hi_dtype).
    `measurements` overrides batch.measurements (chunked callers)."""
    hi = _hi_dtype()
    meas = measurements if measurements is not None else batch.measurements
    if hi is not None:
        xs = _upcast(xs, hi)
        meas = _upcast(meas, hi)

    def one(xs_one, meas_one):
        return batch.residual_fn(xs_one, meas_one)
    return jax.vmap(one)(xs, meas)


def linearize_raw(batch: FactorBatch, xs, forward_dtype=None,
                  measurements=None):
    """Batched UNWHITENED tangent-space Jacobians/residuals: (J, r) with
    J = tuple of (N, rdim, d_i), r = (N, rdim) raw residuals.

    Under the mixed-precision policy the whole linearization forward pass
    (Jacobian AND residual) runs in f64 and is rounded to f32 downstream
    (linearize()): BA-class Jacobians span ~1e6 within a row (focal vs
    distortion columns), so f32 jacfwd corrupts the small-but-coupled entries
    and the Schur-reduced system itself — measured as LM crawling ~3e-4 above
    the optimum at Ladybug scale regardless of solve precision.
    `forward_dtype` overrides the policy (e.g. a deliberately-cheap f32 coarse
    phase)."""
    dims = batch.dims()
    retracts = tuple(manifolds.get(t).retract for t in batch.var_types)
    hi = forward_dtype if forward_dtype is not None else _hi_dtype()
    meas = measurements if measurements is not None else batch.measurements
    # Default policy: RESIDUAL forward pass in hi, Jacobian at WORKING
    # precision (hi jacfwd is ~5-10x on TPU-emulated f64 and measured
    # unnecessary for pose-graph convergence; BA's fine phase passes
    # forward_dtype=f64 explicitly because its Schur assembly does need it).
    j_dt = forward_dtype if forward_dtype is not None else _default_dtype()
    # cast the Jacobian-pass operands to j_dt EXPLICITLY: under the policy
    # the caller may hold f64 master state, and f64 xs would silently promote
    # the whole jacfwd back to (emulated) f64
    xs_j = _upcast(xs, j_dt)
    meas_j = _upcast(meas, j_dt)

    def res_tangent(deltas, xs_one, meas_one):
        xs_p = tuple(r(x, d) for r, x, d in zip(retracts, xs_one, deltas))
        return batch.residual_fn(xs_p, meas_one)

    def one(xs_one, meas_one):
        zeros = tuple(jnp.zeros(d, dtype=j_dt) for d in dims)
        return jax.jacfwd(res_tangent)(zeros, xs_one, meas_one)

    J = jax.vmap(one)(xs_j, meas_j)
    if hi is not None and forward_dtype is None:
        r = residuals(batch, xs, measurements=measurements)  # hi residuals
    else:
        if hi is not None:
            xs = _upcast(xs, hi)
            meas = _upcast(meas, hi)

        def r_one(xs_one, meas_one):
            return batch.residual_fn(xs_one, meas_one)
        r = jax.vmap(r_one)(xs, meas)
    return J, r


def linearize(batch: FactorBatch, xs, forward_dtype=None, out_dtype=None,
              measurements=None, b_dtype=None):
    """Batched whitened Jacobians/residuals in tangent space.

    Returns (A: tuple of (N, rdim, d_i), b: (N, rdim)) with convention
    ||A dx - b||^2,  b = -whitened_residual.

    b_dtype: dtype for b alone (defaults to out_dtype).  The mixed-rhs BA
    phase keeps Jacobians/assembly f32 but the residual side f64 — near
    convergence the gradient rhs is small and absolute f32 noise dominates
    it, while S only needs ~1e-7 relative accuracy (sfm/ba.py round 4).
    """
    if batch.linearize_fn is not None:
        J, b = jax.vmap(batch.linearize_fn)(xs, batch.measurements)
        return J, b

    out_dt = out_dtype if out_dtype is not None else _default_dtype()
    b_dt = b_dtype if b_dtype is not None else out_dt
    J, r = linearize_raw(batch, xs, forward_dtype, measurements)
    wr = batch.noise.whiten(r)
    wJ = tuple(batch.noise.whiten_jacobian(Ji) for Ji in J)
    w = batch.noise.robust_weights(wr)
    if w is not None:
        wr = wr * w[:, None]
        wJ = tuple(Ji * w[:, None, None] for Ji in wJ)
    # b rounded back to working precision AFTER the hi-precision forward pass:
    # rounding the correct value costs eps32*|b|, computing it in f32 costs
    # eps32*|intermediates| >> |b| near convergence
    wJ = tuple(Ji.astype(out_dt) for Ji in wJ)
    return wJ, -wr.astype(b_dt)


# -- concrete factor constructors -----------------------------------------


import functools


@functools.lru_cache(maxsize=None)
def _between_residual(tname):
    # memoized: all Between<T> batches share ONE residual function object, so
    # jitted code specialized on it is reused across batches (incremental path)
    from ..geometry import se2, se3, so3  # local import to avoid cycles

    if tname == "SE3":
        def fn(xs, meas):
            return se3.local(meas, se3.between(xs[0], xs[1]))
    elif tname == "SE2":
        def fn(xs, meas):
            return se2.local(meas, se2.between(xs[0], xs[1]))
    elif tname == "SO3":
        def fn(xs, meas):
            return so3.local(meas, so3.between(xs[0], xs[1]))
    else:
        mt = manifolds.get(tname)
        def fn(xs, meas):
            return mt.local(meas, xs[1] - xs[0])
    return fn


@functools.lru_cache(maxsize=None)
def _prior_residual(tname):
    mt = manifolds.get(tname)

    def fn(xs, meas):
        return mt.local(meas, xs[0])

    return fn


def between_factors(tname: str, keys1, keys2, measurements, noise: NoiseModel,
                    name=None) -> FactorBatch:
    """BetweenFactor<T> batch: error = Local(measured, between(x1, x2)).

    Reference: gtsam/slam/BetweenFactor.h.
    """
    keys = np.stack([np.asarray(keys1), np.asarray(keys2)], axis=1)
    return FactorBatch(
        name=name or f"Between{tname}",
        var_types=(tname, tname),
        keys=keys,
        rdim=manifolds.get(tname).dim,
        residual_fn=_between_residual(tname),
        measurements=measurements,
        noise=noise,
    )


def prior_factors(tname: str, keys, measurements, noise: NoiseModel,
                  name=None) -> FactorBatch:
    """PriorFactor<T> batch: error = Local(prior, x).  Reference: gtsam/slam/PriorFactor.h."""
    keys = np.asarray(keys).reshape(-1, 1)
    return FactorBatch(
        name=name or f"Prior{tname}",
        var_types=(tname,),
        keys=keys,
        rdim=manifolds.get(tname).dim,
        residual_fn=_prior_residual(tname),
        measurements=measurements,
        noise=noise,
    )


def slice_batch(batch: FactorBatch, rows) -> FactorBatch:
    """Row-subset of a factor batch (shares residual_fn; slices data)."""
    rows = np.asarray(rows)
    noise = batch.noise
    data = noise.data
    if data is not None and data.shape[0] > 1:
        data = data[rows]
    return dataclasses.replace(
        batch,
        keys=batch.keys[rows],
        measurements=jax.tree.map(lambda a: a[rows], batch.measurements),
        noise=NoiseModel(noise.kind, data, noise.loss, noise.mu),
    )


def custom_factors(name: str, var_types, keys, residual_fn, rdim,
                   measurements, noise: NoiseModel) -> FactorBatch:
    """Arbitrary user residual — the CustomFactor/ExpressionFactor analog
    (gtsam/nonlinear/CustomFactor.h:36); Jacobians come from JAX autodiff."""
    return FactorBatch(name, tuple(var_types), np.asarray(keys), rdim,
                       residual_fn, measurements, noise)
