"""Sim(2): planar similarity transforms (R(theta), t, s) —
gtsam/geometry/Similarity2.{h,cpp}.

Tangent ordering [u(2); theta; lambda] (4-dof), matching the reference's
Logmap layout (Similarity2.cpp:197-208).  Unlike the reference (whose
Expmap/Logmap ignore the proper SE-part coupling and whose scale handling is
inconsistent — Expmap takes s = v[3] raw while Logmap returns log(s)), this
implements the exact Sim(2) exponential: with the 2x2 generator
A = lambda*I + theta*J the translation column is V u where
V = (exp(A) - I) A^{-1}, evaluated branch-free via the complex scalar
phi = (e^w - 1)/w, w = lambda + i*theta (series for small |w|).
"""

from typing import NamedTuple

import jax.numpy as jnp


class Sim2(NamedTuple):
    R: jnp.ndarray   # (..., 2, 2)
    t: jnp.ndarray   # (..., 2)
    s: jnp.ndarray   # (...,)


def identity(dtype=jnp.float64):
    return Sim2(jnp.eye(2, dtype=dtype), jnp.zeros(2, dtype=dtype),
                jnp.ones((), dtype=dtype))


def _rot2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def transform_from(T: Sim2, p):
    return T.s[..., None] * jnp.einsum("...ij,...j->...i", T.R, p) + T.t


def compose(T1: Sim2, T2: Sim2):
    return Sim2(T1.R @ T2.R,
                T1.s[..., None] * jnp.einsum("...ij,...j->...i", T1.R, T2.t)
                + T1.t,
                T1.s * T2.s)


def inverse(T: Sim2):
    Rt = jnp.swapaxes(T.R, -1, -2)
    si = 1.0 / T.s
    return Sim2(Rt, -si[..., None] * jnp.einsum("...ij,...j->...i", Rt, T.t),
                si)


def between(T1: Sim2, T2: Sim2):
    return compose(inverse(T1), T2)


def _phi(lam, theta):
    """(e^w - 1)/w for w = lam + i theta, as (re, im); series for small w."""
    d = lam * lam + theta * theta
    a = jnp.exp(lam) * jnp.cos(theta) - 1.0
    b = jnp.exp(lam) * jnp.sin(theta)
    small = d < 1e-10
    dsafe = jnp.where(small, 1.0, d)
    re = jnp.where(small, 1.0 + lam / 2.0 + (lam * lam - theta * theta) / 6.0,
                   (a * lam + b * theta) / dsafe)
    im = jnp.where(small, theta / 2.0 + lam * theta / 3.0,
                   (b * lam - a * theta) / dsafe)
    return re, im


def expmap(xi):
    """xi = [u(2); theta; lambda] -> Sim2 (exact exponential)."""
    u, theta, lam = xi[..., :2], xi[..., 2], xi[..., 3]
    p, q = _phi(lam, theta)
    # V = [[p, -q], [q, p]]
    t = jnp.stack([p * u[..., 0] - q * u[..., 1],
                   q * u[..., 0] + p * u[..., 1]], -1)
    return Sim2(_rot2(theta), t, jnp.exp(lam))


def logmap(T: Sim2):
    theta = jnp.arctan2(T.R[..., 1, 0], T.R[..., 0, 0])
    lam = jnp.log(T.s)
    p, q = _phi(lam, theta)
    n2 = p * p + q * q
    # u = V^{-1} t, V^{-1} = [[p, q], [-q, p]] / |phi|^2
    u = jnp.stack([(p * T.t[..., 0] + q * T.t[..., 1]) / n2,
                   (-q * T.t[..., 0] + p * T.t[..., 1]) / n2], -1)
    return jnp.concatenate([u, theta[..., None], lam[..., None]], -1)


def retract(T: Sim2, xi):
    return compose(T, expmap(xi))


def local(T1: Sim2, T2: Sim2):
    return logmap(between(T1, T2))


def align_pairs(p_pairs):
    """Similarity2::Align analog: closed-form 2D Umeyama from point pairs
    ((q_i, p_i) with q = T p).  p_pairs: (N, 2, 2) stacked [q; p] rows."""
    q, p = p_pairs[:, 0], p_pairs[:, 1]
    mq, mp = q.mean(0), p.mean(0)
    dq, dp = q - mq, p - mp
    # complex regression: q ~ z p with z = s e^{i theta}
    num_re = (dp[:, 0] * dq[:, 0] + dp[:, 1] * dq[:, 1]).sum()
    num_im = (dp[:, 0] * dq[:, 1] - dp[:, 1] * dq[:, 0]).sum()
    den = (dp * dp).sum()
    zr, zi = num_re / den, num_im / den
    s = jnp.sqrt(zr * zr + zi * zi)
    theta = jnp.arctan2(zi, zr)
    R = _rot2(theta)
    t = mq - s * (R @ mp)
    return Sim2(R, t, s)
