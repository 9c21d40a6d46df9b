"""Distortion calibration models beyond Cal3_S2/Cal3Bundler.

Reference: gtsam/geometry — Cal3DS2.{h,cpp} (radial-tangential), Cal3Fisheye
(equidistant), Cal3Unified (omni), Cal3_S2Stereo.  All are (uncalibrate,
calibrate) pairs over normalized coords, AD-safe and batched.
"""

import jax.numpy as jnp


def uncalibrate_ds2(K, p):
    """Cal3DS2: K = [fx, fy, s, u0, v0, k1, k2, p1, p2].

    radial (1 + k1 r2 + k2 r4) + tangential distortion, then affine."""
    fx, fy, s, u0, v0, k1, k2, p1, p2 = (K[..., i] for i in range(9))
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    g = 1.0 + k1 * r2 + k2 * r2 * r2
    dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    xd = g * x + dx
    yd = g * y + dy
    return jnp.stack([fx * xd + s * yd + u0, fy * yd + v0], axis=-1)


def calibrate_ds2(K, pixel, iterations: int = 10):
    """Inverse distortion by fixed point (Cal3DS2_Base::calibrate)."""
    fx, fy, s, u0, v0 = (K[..., i] for i in range(5))
    v = (pixel[..., 1] - v0) / fy
    u = (pixel[..., 0] - u0 - s * v) / fx
    pd = jnp.stack([u, v], axis=-1)
    p = pd
    for _ in range(iterations):
        x, y = p[..., 0], p[..., 1]
        r2 = x * x + y * y
        k1, k2, p1, p2 = (K[..., i] for i in range(5, 9))
        g = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        p = (pd - jnp.stack([dx, dy], axis=-1)) / g[..., None]
    return p


def uncalibrate_unified(K, p):
    """Cal3Unified (omni): K = [fx, fy, s, u0, v0, k1, k2, p1, p2, xi].

    Mirror-parameter projection to the normalized unit plane
    (gtsam/geometry/Cal3Unified.cpp spaceToNPlane: m = p / (1 + xi sqrt(|p|^2+1)))
    followed by the Cal3DS2 radial-tangential model."""
    xi = K[..., 9]
    x, y = p[..., 0], p[..., 1]
    sq = 1.0 + xi * jnp.sqrt(x * x + y * y + 1.0)
    m = jnp.stack([x / sq, y / sq], axis=-1)
    return uncalibrate_ds2(K[..., :9], m)


def calibrate_unified(K, pixel, iterations: int = 10):
    """Pixel -> normalized coords: DS2 inverse to the unit plane, then the
    closed-form nPlaneToSpace (Cal3Unified.cpp:118-121)."""
    xi = K[..., 9]
    m = calibrate_ds2(K[..., :9], pixel, iterations)
    x, y = m[..., 0], m[..., 1]
    xy2 = x * x + y * y
    sq_xy = (xi + jnp.sqrt(1.0 + (1.0 - xi * xi) * xy2)) / (xy2 + 1.0)
    scale = sq_xy / (sq_xy - xi)
    return m * scale[..., None]


def uncalibrate_s2stereo(K, p):
    """Cal3_S2Stereo: K = [fx, fy, s, u0, v0, b]; monocular part is Cal3_S2
    (gtsam/geometry/Cal3_S2Stereo.h:67); the baseline b is consumed by
    cameras.stereo_project."""
    fx, fy, s, u0, v0 = (K[..., i] for i in range(5))
    u = fx * p[..., 0] + s * p[..., 1] + u0
    v = fy * p[..., 1] + v0
    return jnp.stack([u, v], axis=-1)


def calibrate_s2stereo(K, pixel):
    fx, fy, s, u0, v0 = (K[..., i] for i in range(5))
    v = (pixel[..., 1] - v0) / fy
    u = (pixel[..., 0] - u0 - s * v) / fx
    return jnp.stack([u, v], axis=-1)


def uncalibrate_fisheye(K, p):
    """Cal3Fisheye (equidistant): K = [fx, fy, s, u0, v0, k1, k2, k3, k4].

    theta-based distortion: td = t (1 + k1 t^2 + k2 t^4 + k3 t^6 + k4 t^8)."""
    fx, fy, s, u0, v0, k1, k2, k3, k4 = (K[..., i] for i in range(9))
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    t = jnp.arctan(r)
    t2 = t * t
    td = t * (1.0 + k1 * t2 + k2 * t2 ** 2 + k3 * t2 ** 3 + k4 * t2 ** 4)
    scale = jnp.where(r2 < 1e-14, 1.0, td / r)
    xd, yd = scale * x, scale * y
    return jnp.stack([fx * xd + s * yd + u0, fy * yd + v0], axis=-1)


def calibrate_fisheye(K, pixel, iterations: int = 10):
    fx, fy, s, u0, v0 = (K[..., i] for i in range(5))
    v = (pixel[..., 1] - v0) / fy
    u = (pixel[..., 0] - u0 - s * v) / fx
    pd = jnp.stack([u, v], axis=-1)
    rd = jnp.linalg.norm(pd, axis=-1)
    k1, k2, k3, k4 = (K[..., i] for i in range(5, 9))
    # invert td(t) by Newton iterations
    t = rd
    for _ in range(iterations):
        t2 = t * t
        f = t * (1.0 + k1 * t2 + k2 * t2 ** 2 + k3 * t2 ** 3 + k4 * t2 ** 4) - rd
        df = (1.0 + 3 * k1 * t2 + 5 * k2 * t2 ** 2 + 7 * k3 * t2 ** 3
              + 9 * k4 * t2 ** 4)
        t = t - f / df
    r = jnp.tan(t)
    scale = jnp.where(rd < 1e-12, 1.0, r / jnp.maximum(rd, 1e-12))
    return pd * scale[..., None]
