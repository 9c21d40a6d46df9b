"""OrientedPlane3 and Line3 manifolds + factors.

Reference: gtsam/geometry/OrientedPlane3.{h,cpp} (unit normal + distance, 3-dof),
gtsam/geometry/Line3.{h,cpp} (rotation + 2 offsets, 4-dof),
gtsam/slam/OrientedPlane3Factor.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..base import noise as noise_mod
from ..graph import factors as factors_mod
from ..graph import manifolds
from . import se3, so3, unit3


class OrientedPlane3(NamedTuple):
    """Plane n.x + d = 0... stored as (normal (3,), d ()). 3-dof manifold."""

    normal: jnp.ndarray
    d: jnp.ndarray


def plane_retract(p: OrientedPlane3, xi):
    return OrientedPlane3(unit3.retract(p.normal, xi[:2]), p.d + xi[2])


def plane_local(p: OrientedPlane3, q: OrientedPlane3):
    return jnp.concatenate([unit3.local(p.normal, q.normal),
                            jnp.reshape(q.d - p.d, (1,))])


def plane_transform(p: OrientedPlane3, T: se3.SE3):
    """Express a world plane in the frame of pose T (OrientedPlane3::transform)."""
    n_local = so3.unrotate(T.R, p.normal)
    d_local = p.d + jnp.dot(p.normal, T.t)
    return OrientedPlane3(n_local, d_local)


manifolds.register(manifolds.ManifoldType(
    "OrientedPlane3", 3, plane_retract, plane_local,
    lambda: OrientedPlane3(jnp.array([0.0, 0.0, 1.0]), jnp.zeros(()))))


def oriented_plane3_factors(pose_keys, plane_keys, measurements,
                            noise: noise_mod.NoiseModel) -> factors_mod.FactorBatch:
    """OrientedPlane3Factor: measured local plane vs world plane seen from pose."""
    def fn(xs, meas):
        pose, plane = xs
        pred = plane_transform(plane, pose)
        m_n, m_d = meas
        return jnp.concatenate([unit3.local(m_n, pred.normal),
                                jnp.reshape(pred.d - m_d, (1,))])

    keys = np.stack([np.asarray(pose_keys), np.asarray(plane_keys)], axis=1)
    return factors_mod.FactorBatch(
        "OrientedPlane3", ("SE3", "OrientedPlane3"), keys, 3, fn,
        measurements, noise)


class Line3(NamedTuple):
    """Line through R*(a, b, 0) + t*R*z (Line3.h: rotation + 2 offsets). 4-dof."""

    R: jnp.ndarray   # (3, 3)
    a: jnp.ndarray   # ()
    b: jnp.ndarray   # ()


def line_retract(l: Line3, xi):
    w = jnp.concatenate([xi[:2], jnp.zeros(1, dtype=xi.dtype)])
    return Line3(l.R @ so3.expmap(w), l.a + xi[2], l.b + xi[3])


def line_local(l1: Line3, l2: Line3):
    w = so3.logmap(so3.between(l1.R, l2.R))
    return jnp.concatenate([w[:2], jnp.reshape(l2.a - l1.a, (1,)),
                            jnp.reshape(l2.b - l1.b, (1,))])


def line_point(l: Line3, t):
    """Point on the line at parameter t."""
    base = so3.rotate(l.R, jnp.stack([l.a, l.b, jnp.zeros_like(l.a)]))
    direction = so3.rotate(l.R, jnp.array([0.0, 0.0, 1.0], dtype=base.dtype))
    return base + t * direction


manifolds.register(manifolds.ManifoldType(
    "Line3", 4, line_retract, line_local,
    lambda: Line3(jnp.eye(3), jnp.zeros(()), jnp.zeros(()))))
