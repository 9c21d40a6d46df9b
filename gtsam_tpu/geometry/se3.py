"""SE(3) as a (R, t) pytree — batched, functional, GTSAM-compatible conventions.

Tangent ordering is [omega(3); v(3)] (rotation first), matching the reference
gtsam/geometry/Pose3.h:139-204.  Retract is the full SE(3) exponential
(reference default GTSAM_POSE3_EXPMAP=ON).  All ops broadcast over leading dims.
"""

from typing import NamedTuple

import jax.numpy as jnp

from . import so3


class SE3(NamedTuple):
    """Rigid transform: x_world = R @ x_local + t.  R:(...,3,3), t:(...,3)."""

    R: jnp.ndarray
    t: jnp.ndarray

    @property
    def batch_shape(self):
        return self.t.shape[:-1]


def identity(dtype=jnp.float64):
    return SE3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))


def expmap(xi):
    """xi = [omega; v] (...,6) -> SE3.  t = V(omega) @ v (true SE(3) exp)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3.expmap(w)
    V = so3.left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return SE3(R, t)


def logmap(T):
    """SE3 -> (...,6) [omega; v]."""
    w = so3.logmap(T.R)
    Vinv = so3.left_jacobian_inverse(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([w, v], axis=-1)


def inverse(T):
    Rt = jnp.swapaxes(T.R, -1, -2)
    return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, T.t))


def compose(T1, T2):
    return SE3(T1.R @ T2.R,
               jnp.einsum("...ij,...j->...i", T1.R, T2.t) + T1.t)


def between(T1, T2):
    """T1^{-1} * T2."""
    return compose(inverse(T1), T2)


def transform_from(T, p):
    """Local -> world: R p + t."""
    return jnp.einsum("...ij,...j->...i", T.R, p) + T.t


def transform_to(T, p):
    """World -> local: R^T (p - t)."""
    return jnp.einsum("...ji,...j->...i", T.R, p - T.t)


def adjoint(T):
    """Ad_T (6x6) in [omega; v] ordering: [[R, 0], [hat(t) R, R]].

    Reference Pose3.h:148 AdjointMap.
    """
    R = T.R
    tR = so3.hat(T.t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bot = jnp.concatenate([tR, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def retract(T, xi):
    """Right retraction: T * Exp(xi)."""
    return compose(T, expmap(xi))


def local(T1, T2):
    """Log(T1^{-1} T2)."""
    return logmap(between(T1, T2))


def stack(transforms):
    """Stack a python list of SE3 into one batched SE3."""
    return SE3(jnp.stack([T.R for T in transforms]),
               jnp.stack([T.t for T in transforms]))
