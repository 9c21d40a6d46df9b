"""Navigation factor constructors: ImuFactor, CombinedImuFactor-style pair,
GPSFactor, ConstantVelocityFactor.

Variable conventions follow the reference examples (ImuFactorsExample.cpp):
  X(i): SE3 pose,  V(i): Vec3 velocity,  B(i): Vec6 bias [acc(3), gyro(3)].
ImuFactor is the 5-way factor of gtsam/navigation/ImuFactor.h:173.
"""

import numpy as np

from ..base import noise as noise_mod
from ..graph import factors as factors_mod
from .navstate import NavState
from .preintegration import PIM, PreintegrationParams, compute_error


def _imu_residual(params: PreintegrationParams):
    def fn(xs, meas):
        pose_i, vel_i, pose_j, vel_j, bias_i = xs
        pim = meas  # PIM pytree row
        state_i = NavState(pose_i.R, pose_i.t, vel_i)
        state_j = NavState(pose_j.R, pose_j.t, vel_j)
        return compute_error(state_i, state_j, bias_i, pim, params)
    return fn


def imu_factors(keys_xi, keys_vi, keys_xj, keys_vj, keys_bi,
                pims: PIM, params: PreintegrationParams) -> factors_mod.FactorBatch:
    """Batch of 5-way ImuFactors.  pims: PIM with leading batch dim.

    Noise: per-factor Gaussian from the preintegrated covariance
    (noiseModel::Gaussian::Covariance(preintMeasCov), ImuFactor.cpp).
    """
    keys = np.stack([np.asarray(k) for k in
                     (keys_xi, keys_vi, keys_xj, keys_vj, keys_bi)], axis=1)
    return factors_mod.FactorBatch(
        name="ImuFactor",
        var_types=("SE3", "Vec3", "SE3", "Vec3", "Vec6"),
        keys=keys,
        rdim=9,
        residual_fn=_imu_residual(params),
        measurements=pims,
        noise=noise_mod.covariance(pims.cov),
    )


def combined_imu_factors(keys_xi, keys_vi, keys_xj, keys_vj, keys_bi, keys_bj,
                         cpims, params: PreintegrationParams
                         ) -> factors_mod.FactorBatch:
    """6-way CombinedImuFactor (gtsam/navigation/CombinedImuFactor.h): 15-dim
    residual [imu error(9); bias_j - bias_i (6)] with the full joint
    preintegrated covariance."""

    def fn(xs, meas):
        pose_i, vel_i, pose_j, vel_j, bias_i, bias_j = xs
        pim, _cov15 = meas
        state_i = NavState(pose_i.R, pose_i.t, vel_i)
        state_j = NavState(pose_j.R, pose_j.t, vel_j)
        r_imu = compute_error(state_i, state_j, bias_i, pim, params)
        import jax.numpy as jnp
        return jnp.concatenate([r_imu, bias_j - bias_i])

    keys = np.stack([np.asarray(k) for k in
                     (keys_xi, keys_vi, keys_xj, keys_vj, keys_bi, keys_bj)],
                    axis=1)
    return factors_mod.FactorBatch(
        name="CombinedImuFactor",
        var_types=("SE3", "Vec3", "SE3", "Vec3", "Vec6", "Vec6"),
        keys=keys,
        rdim=15,
        residual_fn=fn,
        measurements=cpims,
        noise=noise_mod.covariance(cpims.cov15),
    )


def bias_between_factors(keys_bi, keys_bj, params: PreintegrationParams,
                         delta_ts) -> factors_mod.FactorBatch:
    """Bias random-walk between factors (the CombinedImuFactor bias-evolution
    block, modeled as the separate BetweenFactor of ImuFactorsExample.cpp)."""
    delta_ts = np.asarray(delta_ts, dtype=float).reshape(-1)
    n = len(delta_ts)
    sig = np.concatenate([
        np.tile(params.bias_acc_sigma * np.sqrt(delta_ts)[:, None], (1, 3)),
        np.tile(params.bias_omega_sigma * np.sqrt(delta_ts)[:, None], (1, 3)),
    ], axis=1)
    return factors_mod.between_factors(
        "Vec6", keys_bi, keys_bj, np.zeros((n, 6)),
        noise_mod.sigmas(sig), name="BetweenBias")


def gps_factors(keys, positions, noise: noise_mod.NoiseModel) -> factors_mod.FactorBatch:
    """GPSFactor (gtsam/navigation/GPSFactor.h): position prior on SE3 pose."""
    def fn(xs, meas):
        return xs[0].t - meas
    return factors_mod.FactorBatch(
        name="GPSFactor", var_types=("SE3",),
        keys=np.asarray(keys).reshape(-1, 1), rdim=3,
        residual_fn=fn, measurements=np.asarray(positions), noise=noise)


def velocity_prior_factors(keys, velocities, noise) -> factors_mod.FactorBatch:
    return factors_mod.prior_factors("Vec3", keys, np.asarray(velocities), noise)


def bias_prior_factors(keys, biases, noise) -> factors_mod.FactorBatch:
    return factors_mod.prior_factors("Vec6", keys, np.asarray(biases), noise)
