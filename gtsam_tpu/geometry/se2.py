"""SE(2) stored compactly as (..., 3) = [x, y, theta] — batched, functional.

Tangent ordering is [vx, vy, omega] (translation first), matching the reference
gtsam/geometry/Pose2.h (Pose2::Expmap/Logmap).  Retract is the full exponential.
"""

import jax.numpy as jnp

_SMALL = 1e-10


def identity(dtype=jnp.float64):
    return jnp.zeros(3, dtype=dtype)


def theta(p):
    return p[..., 2]


def rot(p):
    """(...,2,2) rotation matrix of the pose."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def _small2(w2):
    """Dtype-aware small-angle threshold (see so3._small2): f32 needs the
    Taylor branch well before 1-cos(w) cancels to zero."""
    return _SMALL if jnp.asarray(w2).dtype == jnp.float64 else 1e-3


def _wrap(a):
    """Wrap angle to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def expmap(xi):
    """xi = [vx, vy, w] -> pose [x, y, theta];  t = V(w) v with the SE(2) V."""
    v, w = xi[..., :2], xi[..., 2]
    w2 = w * w
    small = w2 < _small2(w2)
    sw = jnp.where(small, 1.0, w)
    # A = sin w / w, B = (1 - cos w)/w
    A = jnp.where(small, 1.0 - w2 / 6.0, jnp.sin(sw) / sw)
    B = jnp.where(small, 0.5 * w - w2 * w / 24.0, (1.0 - jnp.cos(sw)) / sw)
    x = A * xi[..., 0] - B * xi[..., 1]
    y = B * xi[..., 0] + A * xi[..., 1]
    return jnp.stack([x, y, w], axis=-1)


def logmap(p):
    """pose -> [vx, vy, w]."""
    w = _wrap(p[..., 2])
    w2 = w * w
    small = w2 < _small2(w2)
    sw = jnp.where(small, 1.0, w)
    A = jnp.where(small, 1.0 - w2 / 6.0, jnp.sin(sw) / sw)
    B = jnp.where(small, 0.5 * w, (1.0 - jnp.cos(sw)) / sw)
    det = A * A + B * B
    # V^{-1} = 1/det [[A, B], [-B, A]]
    vx = (A * p[..., 0] + B * p[..., 1]) / det
    vy = (-B * p[..., 0] + A * p[..., 1]) / det
    return jnp.stack([vx, vy, w], axis=-1)


def inverse(p):
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x, y = p[..., 0], p[..., 1]
    return jnp.stack([-(c * x + s * y), -(-s * x + c * y), -p[..., 2]], axis=-1)


def compose(p1, p2):
    c, s = jnp.cos(p1[..., 2]), jnp.sin(p1[..., 2])
    x = p1[..., 0] + c * p2[..., 0] - s * p2[..., 1]
    y = p1[..., 1] + s * p2[..., 0] + c * p2[..., 1]
    return jnp.stack([x, y, p1[..., 2] + p2[..., 2]], axis=-1)


def between(p1, p2):
    return compose(inverse(p1), p2)


def retract(p, xi):
    return compose(p, expmap(xi))


def local(p1, p2):
    return logmap(between(p1, p2))


def transform_from(p, pt):
    """Local -> world."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x = c * pt[..., 0] - s * pt[..., 1] + p[..., 0]
    y = s * pt[..., 0] + c * pt[..., 1] + p[..., 1]
    return jnp.stack([x, y], axis=-1)


def transform_to(p, pt):
    """World -> local."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    dx, dy = pt[..., 0] - p[..., 0], pt[..., 1] - p[..., 1]
    return jnp.stack([c * dx + s * dy, -s * dx + c * dy], axis=-1)


def bearing(p, pt):
    """Bearing angle (Rot2 as angle) from pose to 2D point."""
    local_pt = transform_to(p, pt)
    return jnp.arctan2(local_pt[..., 1], local_pt[..., 0])


def range_to(p, pt):
    return jnp.linalg.norm(pt - p[..., :2], axis=-1)
