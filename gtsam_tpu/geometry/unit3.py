"""Unit3: directions on S^2 with a 2-dof tangent (gtsam/geometry/Unit3.{h,cpp}).

Stored as unit 3-vectors; retract moves in the local tangent basis B(p) (3x2).
"""

import jax.numpy as jnp


def basis(p):
    """Orthonormal 3x2 basis of the tangent plane at p (Unit3::basis)."""
    # pick the axis least aligned with p
    ax = jnp.where(jnp.abs(p[..., 0:1]) < 0.9,
                   jnp.array([1.0, 0.0, 0.0], dtype=p.dtype),
                   jnp.array([0.0, 1.0, 0.0], dtype=p.dtype))
    b1 = jnp.cross(p, ax)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(p, b1)
    return jnp.stack([b1, b2], axis=-1)  # (..., 3, 2)


def retract(p, xi):
    """Exponential-map retraction on the sphere."""
    B = basis(p)
    v = jnp.einsum("...ij,...j->...i", B, xi)
    theta = jnp.linalg.norm(v, axis=-1, keepdims=True)
    small = theta < 1e-12
    ts = jnp.where(small, 1.0, theta)
    q = jnp.cos(theta) * p + jnp.sin(theta) * (v / ts)
    q = jnp.where(small, p + v, q)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def local(p, q):
    """Inverse retraction: coordinates of q in p's tangent basis."""
    B = basis(p)
    c = jnp.clip(jnp.sum(p * q, axis=-1), -1.0, 1.0)
    theta = jnp.arccos(c)
    perp = q - c[..., None] * p
    n = jnp.linalg.norm(perp, axis=-1, keepdims=True)
    small = n < 1e-12
    ns = jnp.where(small, 1.0, n)
    v = theta[..., None] * perp / ns
    v = jnp.where(small, jnp.zeros_like(v), v)
    return jnp.einsum("...ji,...j->...i", B, v)


def error_vector(p, q):
    """Signed 2D error: q projected into p's tangent basis
    (gtsam/geometry/Unit3.cpp errorVector: xi = B(p)^T q)."""
    B = basis(p)
    return jnp.einsum("...ji,...j->...i", B, q)


def identity(dtype=jnp.float64):
    return jnp.array([0.0, 0.0, 1.0], dtype=dtype)
