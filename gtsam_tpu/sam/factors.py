"""sam module: bearing, range, and bearing-range factor batches.

Reference: gtsam/sam/{BearingFactor,RangeFactor,BearingRangeFactor}.h — thin
expression factors over traits; here thin residual functions over geometry ops.
"""

import jax.numpy as jnp
import numpy as np

from ..base import noise as noise_mod
from ..geometry import se2
from ..graph import factors as factors_mod


def _wrap_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def bearing_range_2d_factors(pose_keys, point_keys, bearings, ranges,
                             noise: noise_mod.NoiseModel) -> factors_mod.FactorBatch:
    """BearingRangeFactor<Pose2, Point2>: residual = [wrap(bearing - b), range - r]."""
    meas = np.stack([np.asarray(bearings), np.asarray(ranges)], axis=1)

    def fn(xs, m):
        pose, pt = xs
        local = se2.transform_to(pose, pt)
        b = jnp.arctan2(local[1], local[0])
        r = jnp.linalg.norm(local)
        return jnp.stack([_wrap_angle(b - m[0]), r - m[1]])

    keys = np.stack([np.asarray(pose_keys), np.asarray(point_keys)], axis=1)
    return factors_mod.FactorBatch("BearingRange2D", ("SE2", "Point2"), keys, 2,
                                   fn, jnp.asarray(meas), noise)


def range_2d_factors(pose_keys, point_keys, ranges, noise) -> factors_mod.FactorBatch:
    def fn(xs, m):
        return jnp.reshape(se2.range_to(xs[0], xs[1]) - m, (1,))

    keys = np.stack([np.asarray(pose_keys), np.asarray(point_keys)], axis=1)
    return factors_mod.FactorBatch("Range2D", ("SE2", "Point2"), keys, 1, fn,
                                   jnp.asarray(np.asarray(ranges, dtype=float)),
                                   noise)


def bearing_2d_factors(pose_keys, point_keys, bearings, noise) -> factors_mod.FactorBatch:
    def fn(xs, m):
        return jnp.reshape(_wrap_angle(se2.bearing(xs[0], xs[1]) - m), (1,))

    keys = np.stack([np.asarray(pose_keys), np.asarray(point_keys)], axis=1)
    return factors_mod.FactorBatch("Bearing2D", ("SE2", "Point2"), keys, 1, fn,
                                   jnp.asarray(np.asarray(bearings, dtype=float)),
                                   noise)


def range_3d_factors(pose_keys, point_keys, ranges, noise) -> factors_mod.FactorBatch:
    """RangeFactor<Pose3, Point3>."""

    def fn(xs, m):
        return jnp.reshape(jnp.linalg.norm(xs[1] - xs[0].t) - m, (1,))

    keys = np.stack([np.asarray(pose_keys), np.asarray(point_keys)], axis=1)
    return factors_mod.FactorBatch("Range3D", ("SE3", "Point3"), keys, 1, fn,
                                   jnp.asarray(np.asarray(ranges, dtype=float)),
                                   noise)
