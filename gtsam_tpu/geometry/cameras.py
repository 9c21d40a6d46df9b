"""Cameras and calibration — batched, functional, AD-safe.

Reference analogs: gtsam/geometry/Cal3_S2.h, Cal3Bundler.h, Cal3DS2.h,
PinholeCamera.h (project2:245), CalibratedCamera.h.  Conventions match GTSAM:
pose is camera-to-world (x_world = pose * x_camera), projection is
  p_cam = pose^-1 * p_world;  pinhole (u,v) = (x/z, y/z);  pixel = uncalibrate(K, (u,v)).
Cheirality (z <= 0) is masked, not thrown (vmap-safe): residuals are zeroed and
Jacobians vanish — the GTSAM GeneralSFMFactor degrade-gracefully behavior.
"""

from typing import NamedTuple

import jax.numpy as jnp

from . import se3
from .se3 import SE3

CHEIRALITY_EPS = 1e-8


class BalCamera(NamedTuple):
    """PinholeCamera<Cal3Bundler>: pose + (f, k1, k2).  9-dof manifold."""

    pose: SE3
    calib: jnp.ndarray  # (..., 3) = f, k1, k2


def bal_retract(cam: BalCamera, d):
    """Tangent ordering: [pose(6); calib(3)] (PinholeCamera.h retract)."""
    return BalCamera(se3.retract(cam.pose, d[..., :6]), cam.calib + d[..., 6:])


def bal_local(c1: BalCamera, c2: BalCamera):
    return jnp.concatenate([se3.local(c1.pose, c2.pose), c2.calib - c1.calib], axis=-1)


def bal_identity():
    return BalCamera(se3.identity(), jnp.array([1.0, 0.0, 0.0]))


def uncalibrate_bundler(calib, p):
    """Cal3Bundler::uncalibrate — p: (...,2) normalized coords -> pixels.

    r2 = |p|^2; g = f (1 + k1 r2 + k2 r2^2); pixel = g * p  (u0 = v0 = 0).
    """
    f, k1, k2 = calib[..., 0], calib[..., 1], calib[..., 2]
    r2 = jnp.sum(p * p, axis=-1)
    g = f * (1.0 + k1 * r2 + k2 * r2 * r2)
    return p * g[..., None]


def calibrate_bundler(calib, pixel, iterations=5):
    """Inverse of uncalibrate (fixed-point iteration, Cal3Bundler::calibrate)."""
    f = calib[..., 0:1]
    p = pixel / f
    for _ in range(iterations):
        r2 = jnp.sum(p * p, axis=-1, keepdims=True)
        g = 1.0 + calib[..., 1:2] * r2 + calib[..., 2:3] * r2 * r2
        p = pixel / (f * g)
    return p


def project_point(pose: SE3, calib, point, uncalibrate):
    """World point -> pixel; returns (pixel, valid_mask)."""
    pc = se3.transform_to(pose, point)
    z = pc[..., 2]
    valid = z > CHEIRALITY_EPS
    zs = jnp.where(valid, z, 1.0)
    p = pc[..., :2] / zs[..., None]
    pixel = uncalibrate(calib, p)
    return pixel, valid


def bal_project(cam: BalCamera, point):
    return project_point(cam.pose, cam.calib, point, uncalibrate_bundler)


# -- Cal3_S2 pinhole (fx, fy, s, u0, v0) ----------------------------------


def uncalibrate_cal3s2(K, p):
    """K: (...,5) = fx, fy, s, u0, v0 (Cal3_S2.h)."""
    fx, fy, s, u0, v0 = (K[..., i] for i in range(5))
    u = fx * p[..., 0] + s * p[..., 1] + u0
    v = fy * p[..., 1] + v0
    return jnp.stack([u, v], axis=-1)


def calibrate_cal3s2(K, pixel):
    fx, fy, s, u0, v0 = (K[..., i] for i in range(5))
    v = (pixel[..., 1] - v0) / fy
    u = (pixel[..., 0] - u0 - s * v) / fx
    return jnp.stack([u, v], axis=-1)


class PinholeCameraS2(NamedTuple):
    """PinholeCamera<Cal3_S2>: pose + 5-dof calibration.  11-dof manifold."""

    pose: SE3
    calib: jnp.ndarray  # (..., 5)


def pinhole_s2_project(cam: PinholeCameraS2, point):
    return project_point(cam.pose, cam.calib, point, uncalibrate_cal3s2)


def backproject(pose: SE3, calib, pixel, depth, calibrate):
    """Pixel + depth -> world point (PinholeCamera::backproject)."""
    p = calibrate(calib, pixel)
    pc = jnp.concatenate([p * depth[..., None], depth[..., None]], axis=-1)
    return se3.transform_from(pose, pc)


# -- spherical ---------------------------------------------------------------


def spherical_project(pose: SE3, point):
    """SphericalCamera::project2 (gtsam/geometry/SphericalCamera.h:159):
    world point -> Unit3 bearing in the camera frame; valid iff the point is
    not at the camera centre (no cheirality constraint on a sphere)."""
    pc = se3.transform_to(pose, point)
    n = jnp.linalg.norm(pc, axis=-1, keepdims=True)
    valid = n[..., 0] > CHEIRALITY_EPS
    ns = jnp.where(valid[..., None], n, 1.0)
    return pc / ns, valid


def spherical_backproject(pose: SE3, bearing, depth):
    """Unit3 bearing + range -> world point (SphericalCamera::backproject)."""
    return se3.transform_from(pose, bearing * depth[..., None])


def spherical_reprojection_error(pose: SE3, point, measured):
    """2D tangent-space error B(measured)^T projected
    (SphericalCamera::reprojectionError, SphericalCamera.cpp:90-104)."""
    from . import unit3

    projected, valid = spherical_project(pose, point)
    err = unit3.error_vector(measured, projected)
    return jnp.where(valid[..., None], err, 0.0), valid


# -- stereo ----------------------------------------------------------------


def stereo_project(pose: SE3, K, baseline, point):
    """StereoCamera::project (StereoCamera.h): returns (uL, uR, v), valid."""
    pc = se3.transform_to(pose, point)
    z = pc[..., 2]
    valid = z > CHEIRALITY_EPS
    zs = jnp.where(valid, z, 1.0)
    fx, fy, s, u0, v0 = (K[..., i] for i in range(5))
    uL = u0 + fx * pc[..., 0] / zs
    uR = u0 + fx * (pc[..., 0] - baseline) / zs
    v = v0 + fy * pc[..., 1] / zs
    return jnp.stack([uL, uR, v], axis=-1), valid
