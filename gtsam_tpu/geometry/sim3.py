"""Sim(3): similarity transforms (R, t, s) — gtsam/geometry/Similarity3.{h,cpp}.

Tangent ordering [omega(3); v(3); lambda(1)] (7-dof).  Action: x -> s R x + t.
Used for scale-drift-aware loop closing.  The translation part of the
exponential uses V(omega, lambda) = ∫ exp(lambda τ) exp(τ ω̂) dτ evaluated by
Simpson quadrature — branch-free, differentiable, exact to ~1e-10 for the
step sizes optimizers take (this is a cold-path op).
"""

from typing import NamedTuple

import jax.numpy as jnp

from . import so3


class Sim3(NamedTuple):
    R: jnp.ndarray   # (..., 3, 3)
    t: jnp.ndarray   # (..., 3)
    s: jnp.ndarray   # (...,)


def identity(dtype=jnp.float64):
    return Sim3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
                jnp.ones((), dtype=dtype))


def transform_from(T: Sim3, p):
    return T.s[..., None] * so3.rotate(T.R, p) + T.t


def compose(T1: Sim3, T2: Sim3):
    return Sim3(T1.R @ T2.R,
                T1.s[..., None] * so3.rotate(T1.R, T2.t) + T1.t,
                T1.s * T2.s)


def inverse(T: Sim3):
    Rt = jnp.swapaxes(T.R, -1, -2)
    si = 1.0 / T.s
    return Sim3(Rt, -si[..., None] * so3.rotate(Rt, T.t), si)


def between(T1: Sim3, T2: Sim3):
    return compose(inverse(T1), T2)


def _V(w, lam, steps: int = 64):
    """∫_0^1 exp(lam τ) Exp(τ w) dτ by composite Simpson."""
    taus = jnp.linspace(0.0, 1.0, steps + 1)
    # Simpson weights
    wts = jnp.ones(steps + 1).at[1:-1:2].set(4.0).at[2:-1:2].set(2.0)
    wts = wts / (3.0 * steps)

    def f(tau):
        return jnp.exp(lam * tau)[..., None, None] * so3.expmap(
            tau[..., None] * w if w.ndim == 1 else tau * w)

    # vectorized over taus for the common single-element case
    mats = jnp.stack([jnp.exp(lam * t) * so3.expmap(t * w) for t in taus])
    return jnp.einsum("k,kij->ij", wts.astype(mats.dtype), mats)


def expmap(xi):
    """xi = [omega, v, lambda] -> Sim3 (single element; vmap for batches)."""
    w, v, lam = xi[:3], xi[3:6], xi[6]
    R = so3.expmap(w)
    s = jnp.exp(lam)
    V = _V(w, lam)
    return Sim3(R, V @ v, s)


def logmap(T: Sim3):
    w = so3.logmap(T.R)
    lam = jnp.log(T.s)
    V = _V(w, lam)
    v = jnp.linalg.solve(V, T.t)
    return jnp.concatenate([w, v, lam[None]])


def retract(T: Sim3, xi):
    return compose(T, expmap(xi))


def local(T1: Sim3, T2: Sim3):
    return logmap(between(T1, T2))
