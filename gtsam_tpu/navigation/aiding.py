"""Aiding factors: attitude (gravity direction), magnetometer, barometer,
constant velocity.

Reference: gtsam/navigation — AttitudeFactor.{h,cpp} (Rot3 vs measured gravity
direction, 2-dof Unit3 error), MagFactor.h, BarometricFactor, ConstantVelocityFactor.h.
"""

import jax.numpy as jnp
import numpy as np

from ..base import noise as noise_mod
from ..geometry import so3, unit3
from ..graph import factors as factors_mod


def pose_attitude_factors(keys, measured_nav, reference_body,
                          noise: noise_mod.NoiseModel) -> factors_mod.FactorBatch:
    """Pose3AttitudeFactor: error = Unit3 difference between nRef (measured in
    nav frame) and R * bRef (body reference rotated into nav)."""
    nZ = np.asarray(measured_nav, dtype=float)
    nZ = nZ / np.linalg.norm(nZ, axis=-1, keepdims=True)
    bRef = np.asarray(reference_body, dtype=float)
    bRef = bRef / np.linalg.norm(bRef, axis=-1, keepdims=True)

    def fn(xs, meas):
        nz, bref = meas
        pred = so3.rotate(xs[0].R, bref)
        return unit3.local(nz, pred)

    return factors_mod.FactorBatch(
        "Pose3Attitude", ("SE3",), np.asarray(keys).reshape(-1, 1), 2, fn,
        (jnp.asarray(nZ), jnp.asarray(bRef)), noise)


def rot_attitude_factors(keys, measured_nav, reference_body,
                         noise) -> factors_mod.FactorBatch:
    """Rot3AttitudeFactor."""
    nZ = np.asarray(measured_nav, dtype=float)
    nZ = nZ / np.linalg.norm(nZ, axis=-1, keepdims=True)
    bRef = np.asarray(reference_body, dtype=float)
    bRef = bRef / np.linalg.norm(bRef, axis=-1, keepdims=True)

    def fn(xs, meas):
        nz, bref = meas
        pred = so3.rotate(xs[0], bref)
        return unit3.local(nz, pred)

    return factors_mod.FactorBatch(
        "Rot3Attitude", ("SO3",), np.asarray(keys).reshape(-1, 1), 2, fn,
        (jnp.asarray(nZ), jnp.asarray(bRef)), noise)


def mag_factors(keys, measured_body, scale, direction_nav, bias_body,
                noise) -> factors_mod.FactorBatch:
    """MagFactor1 (rotation-only): measured = scale * R^T * d_nav + bias."""
    d = np.asarray(direction_nav, dtype=float)
    d = d / np.linalg.norm(d)

    def fn(xs, m):
        pred = scale * so3.unrotate(xs[0], jnp.asarray(d)) + jnp.asarray(bias_body)
        return pred - m

    return factors_mod.FactorBatch(
        "Mag", ("SO3",), np.asarray(keys).reshape(-1, 1), 3, fn,
        jnp.asarray(np.asarray(measured_body, dtype=float)), noise)


def barometric_factors(keys, heights, noise) -> factors_mod.FactorBatch:
    """BarometricFactor: height measurement on pose z (simplified: meters)."""

    def fn(xs, h):
        return jnp.reshape(xs[0].t[2] - h, (1,))

    return factors_mod.FactorBatch(
        "Barometric", ("SE3",), np.asarray(keys).reshape(-1, 1), 1, fn,
        jnp.asarray(np.asarray(heights, dtype=float)), noise)


def constant_velocity_factors(keys_i, keys_j, dts, noise) -> factors_mod.FactorBatch:
    """ConstantVelocityFactor on Vec3 velocities (v_j == v_i)."""

    def fn(xs, _dt):
        return xs[1] - xs[0]

    keys = np.stack([np.asarray(keys_i), np.asarray(keys_j)], axis=1)
    return factors_mod.FactorBatch(
        "ConstantVelocity", ("Vec3", "Vec3"), keys, 3, fn,
        jnp.asarray(np.asarray(dts, dtype=float)), noise)


def mag_pose_factors(keys, measured_body, scale, direction_nav, bias_body,
                     noise) -> factors_mod.FactorBatch:
    """MagPoseFactor<Pose3> (gtsam/navigation/MagPoseFactor.h): magnetometer
    measurement against the rotation part of a Pose3:
    measured = scale * nRb(pose)^T * d_nav + bias_body."""
    d = np.asarray(direction_nav, dtype=float)
    d = d / np.linalg.norm(d)

    def fn(xs, m):
        pred = scale * so3.unrotate(xs[0].R, jnp.asarray(d)) + jnp.asarray(bias_body)
        return pred - m

    return factors_mod.FactorBatch(
        "MagPose3", ("SE3",), np.asarray(keys).reshape(-1, 1), 3, fn,
        jnp.asarray(np.asarray(measured_body, dtype=float)), noise)
