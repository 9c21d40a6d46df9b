"""Manifold type registry.

The reference makes ANY type optimizable via a traits<T> specialization providing
{dimension, Local, Retract} (gtsam/base/Manifold.h:50, GTSAM-Concepts.md).  The
TPU-native analog: a registry of named manifold types, each defining single-element
`retract`/`local` on a pytree representation; Values stores one stacked (batched)
pytree per type and vmaps these ops.
"""

import dataclasses
from typing import Callable

import jax.numpy as jnp

from ..geometry import cameras, se2, se3, sim2, sim3, so3


@dataclasses.dataclass(frozen=True)
class ManifoldType:
    name: str
    dim: int                       # tangent dimension
    retract: Callable              # (x, delta:(dim,)) -> x'
    local: Callable                # (x, y) -> delta:(dim,)
    identity: Callable             # () -> example element


def _vector_manifold(name: str, d: int) -> ManifoldType:
    return ManifoldType(
        name=name,
        dim=d,
        retract=lambda x, delta: x + delta,
        local=lambda x, y: y - x,
        identity=lambda: jnp.zeros(d),
    )


MANIFOLDS: dict = {}


def register(m: ManifoldType) -> ManifoldType:
    MANIFOLDS[m.name] = m
    return m


def get(name: str) -> ManifoldType:
    try:
        return MANIFOLDS[name]
    except KeyError:
        # Vector spaces of any dimension on demand: "Vec5" etc.
        if name.startswith("Vec"):
            return register(_vector_manifold(name, int(name[3:])))
        raise


SE3 = register(ManifoldType("SE3", 6, se3.retract, se3.local, se3.identity))
SE2 = register(ManifoldType("SE2", 3, se2.retract, se2.local, se2.identity))
SO3 = register(ManifoldType("SO3", 3, so3.retract, so3.local, so3.identity))
POINT3 = register(_vector_manifold("Point3", 3))
POINT2 = register(_vector_manifold("Point2", 2))
VEC3 = register(_vector_manifold("Vec3", 3))
VEC6 = register(_vector_manifold("Vec6", 6))
SIM2 = register(ManifoldType("Sim2", 4, sim2.retract, sim2.local,
                             sim2.identity))
SIM3 = register(ManifoldType("Sim3", 7, sim3.retract, sim3.local,
                             sim3.identity))
BAL_CAMERA = register(ManifoldType(
    "BalCamera", 9, cameras.bal_retract, cameras.bal_local, cameras.bal_identity))
PINHOLE_S2 = register(ManifoldType(
    "PinholeCameraS2", 11,
    lambda c, d: cameras.PinholeCameraS2(
        se3.retract(c.pose, d[..., :6]), c.calib + d[..., 6:]),
    lambda a, b: jnp.concatenate(
        [se3.local(a.pose, b.pose), b.calib - a.calib], axis=-1),
    lambda: cameras.PinholeCameraS2(
        se3.identity(), jnp.array([1.0, 1.0, 0.0, 0.0, 0.0])),
))
SCALAR = register(ManifoldType(
    "Scalar", 1,
    lambda x, d: x + d[0],
    lambda x, y: jnp.reshape(y - x, (1,)),
    lambda: jnp.zeros(()),
))


def _register_navstate():
    # NavState (gtsam/navigation/NavState.h:34) doubles as the PoseRTV
    # dynamics state (gtsam_unstable/dynamics/PoseRTV.h).
    from ..navigation import navstate as ns
    register(ManifoldType("NavState", 9, ns.retract, ns.local, ns.identity))


_register_navstate()
