"""Additional SLAM factor batches: stereo, generic projection (pose+landmark),
essential matrix, pose priors on components, Karcher mean, nonlinear equality.

Reference: gtsam/slam — StereoFactor.h, ProjectionFactor.h,
EssentialMatrixFactor.h, PoseRotationPrior.h, PoseTranslationPrior.h,
KarcherMeanFactor.{h,-inl.h}, NonlinearEquality.h, AntiFactor.h.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..base import noise as noise_mod
from ..geometry import se3, so3
from ..geometry.cameras import stereo_project, uncalibrate_cal3s2
from ..geometry.se3 import SE3
from ..graph import factors as factors_mod


def generic_projection_factors(pose_keys, point_keys, measurements, K,
                               noise: noise_mod.NoiseModel,
                               body_P_sensor: Optional[SE3] = None
                               ) -> factors_mod.FactorBatch:
    """GenericProjectionFactor<Pose3, Point3, Cal3_S2>: fixed K, pose+landmark."""
    K = jnp.asarray(K, dtype=_default_dtype())

    def fn(xs, uv):
        pose, point = xs
        if body_P_sensor is not None:
            pose = se3.compose(pose, body_P_sensor)
        pc = se3.transform_to(pose, point)
        z = pc[2]
        ok = z > 1e-8
        zs = jnp.where(ok, z, 1.0)
        pix = uncalibrate_cal3s2(K, pc[:2] / zs)
        return jnp.where(ok, pix - uv, 1.0e3)

    keys = np.stack([np.asarray(pose_keys), np.asarray(point_keys)], axis=1)
    return factors_mod.FactorBatch(
        "GenericProjection", ("SE3", "Point3"), keys, 2, fn,
        jnp.asarray(np.asarray(measurements, dtype=float)), noise)


def stereo_factors(pose_keys, point_keys, measurements, K, baseline,
                   noise: noise_mod.NoiseModel) -> factors_mod.FactorBatch:
    """GenericStereoFactor: measurement (uL, uR, v)."""
    K = jnp.asarray(K, dtype=_default_dtype())

    def fn(xs, m):
        pose, point = xs
        z, ok = stereo_project(pose, K, baseline, point)
        return jnp.where(ok, z - m, 1.0e3)

    keys = np.stack([np.asarray(pose_keys), np.asarray(point_keys)], axis=1)
    return factors_mod.FactorBatch(
        "Stereo", ("SE3", "Point3"), keys, 3, fn,
        jnp.asarray(np.asarray(measurements, dtype=float)), noise)


def essential_matrix_from_pose(T: SE3):
    """E = hat(t_normalized) @ R for the relative pose (EssentialMatrix.h)."""
    t = T.t / jnp.maximum(jnp.linalg.norm(T.t), 1e-12)
    return so3.hat(t) @ T.R


def essential_matrix_factors(pose_keys_i, pose_keys_j, point_pairs,
                             noise: noise_mod.NoiseModel
                             ) -> factors_mod.FactorBatch:
    """Epipolar constraint between two poses: r = x_j^T E(T_i^-1 T_j) x_i.

    point_pairs: (N, 2, 2) calibrated coords in cameras i and j
    (EssentialMatrixConstraint semantics via relative pose)."""
    pp = jnp.asarray(np.asarray(point_pairs, dtype=float))

    def fn(xs, pts):
        Ti, Tj = xs
        rel = se3.between(Ti, Tj)  # cam_j -> cam_i coordinates
        E = essential_matrix_from_pose(rel)
        xi = jnp.concatenate([pts[0], jnp.ones(1, dtype=pts.dtype)])
        xj = jnp.concatenate([pts[1], jnp.ones(1, dtype=pts.dtype)])
        # x_i^T [t]x R x_j = 0 for x_i = rel * x_j (up to scale)
        return jnp.reshape(xi @ (E @ xj), (1,))

    keys = np.stack([np.asarray(pose_keys_i), np.asarray(pose_keys_j)], axis=1)
    return factors_mod.FactorBatch(
        "EssentialEpipolar", ("SE3", "SE3"), keys, 1, fn, pp, noise)


def pose_rotation_priors(keys, rotations, noise) -> factors_mod.FactorBatch:
    """PoseRotationPrior<Pose3>: prior on the rotation part only."""

    def fn(xs, R):
        return so3.logmap(so3.between(R, xs[0].R))

    return factors_mod.FactorBatch(
        "PoseRotationPrior", ("SE3",), np.asarray(keys).reshape(-1, 1), 3, fn,
        jnp.asarray(rotations), noise)


def pose_translation_priors(keys, translations, noise) -> factors_mod.FactorBatch:
    """PoseTranslationPrior<Pose3>: prior on the translation part only."""

    def fn(xs, t):
        return xs[0].t - t

    return factors_mod.FactorBatch(
        "PoseTranslationPrior", ("SE3",), np.asarray(keys).reshape(-1, 1), 3, fn,
        jnp.asarray(np.asarray(translations, dtype=float)), noise)


def karcher_mean_so3(rotations, iterations: int = 10):
    """FindKarcherMean (KarcherMeanFactor.h:34): Riemannian mean on SO(3)."""
    R = jnp.asarray(rotations)

    def body(mean, _):
        logs = so3.logmap(so3.between(mean[None].repeat(R.shape[0], 0), R))
        return so3.retract(mean, jnp.mean(logs, axis=0)), None

    mean, _ = jax.lax.scan(body, R[0], None, length=iterations)
    return mean


def nonlinear_equality_factors(tname: str, keys, targets, mu: float = 1e6,
                               exact: bool = False) -> factors_mod.FactorBatch:
    """NonlinearEquality<T> (the reference's constrained noise model semantics,
    NoiseModel.h:260).  exact=False approximates the constraint with precision
    mu (works with every solver); exact=True emits sigma==0 constrained noise,
    eliminated exactly by the dense solver's KKT path."""
    from ..graph import manifolds
    m = manifolds.get(tname)

    def fn(xs, target):
        return m.local(target, xs[0])

    noise = (noise_mod.constrained_all(m.dim, mu=mu) if exact
             else noise_mod.isotropic(m.dim, 1.0 / np.sqrt(mu)))
    return factors_mod.FactorBatch(
        f"NonlinearEquality{tname}", (tname,), np.asarray(keys).reshape(-1, 1),
        m.dim, fn, targets, noise)


def anti_factor(batch: factors_mod.FactorBatch) -> factors_mod.FactorBatch:
    """AntiFactor (gtsam/slam/AntiFactor.h): subtracts a factor's information,
    exactly cancelling its effect in dense/sparse GN assembly."""
    import dataclasses as _dc
    return _dc.replace(batch, sign=-batch.sign,
                       name=f"Anti{batch.name}")
