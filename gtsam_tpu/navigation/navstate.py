"""NavState: (attitude R, position p, velocity v) — the SE_2(3)-style 9-dof
manifold of gtsam/navigation/NavState.h:34.

Retract (NavState.cpp:107): body-frame increments
  R' = R Exp(dtheta);  p' = p + R dp;  v' = v + R dv
local() is the exact inverse.  Tangent ordering [dtheta, dp, dv].
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry import so3


class NavState(NamedTuple):
    R: jnp.ndarray  # (..., 3, 3)
    p: jnp.ndarray  # (..., 3)
    v: jnp.ndarray  # (..., 3)


def identity(dtype=jnp.float64):
    return NavState(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
                    jnp.zeros(3, dtype=dtype))


def retract(x: NavState, xi):
    dth, dp, dv = xi[..., :3], xi[..., 3:6], xi[..., 6:]
    return NavState(
        x.R @ so3.expmap(dth),
        x.p + so3.rotate(x.R, dp),
        x.v + so3.rotate(x.R, dv),
    )


def local(x: NavState, y: NavState):
    dth = so3.logmap(so3.between(x.R, y.R))
    dp = so3.unrotate(x.R, y.p - x.p)
    dv = so3.unrotate(x.R, y.v - x.v)
    return jnp.concatenate([dth, dp, dv], axis=-1)
