"""Attitude-only (gyro) preintegration + AHRSFactor.

Reference: gtsam/navigation/PreintegratedRotation.{h,cpp} (ΔR product with
bias Jacobian), gtsam/navigation/AHRSFactor.{h,cpp} (3-way Rot_i, Rot_j, bias
factor).  The per-sample loop is a lax.scan; step Jacobians by autodiff.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype

from ..base import noise as noise_mod
from ..geometry import so3
from ..graph import factors as factors_mod


class PreintegratedRotation(NamedTuple):
    deltaR: jnp.ndarray      # (3,3) ΔR̃ij at bias_hat
    H_bias: jnp.ndarray      # (3,3) ∂Log(ΔR)/∂bias_omega
    cov: jnp.ndarray         # (3,3) rotation preintegration covariance
    bias_hat: jnp.ndarray    # (3,)
    delta_t: jnp.ndarray


def preintegrate_rotation(gyros, dts, bias_hat, gyro_sigma: float
                          ) -> PreintegratedRotation:
    """ΔR = Π Exp((ω−b̂)dt) with covariance and bias Jacobian propagation
    (PreintegratedRotation::integrateGyroMeasurement)."""
    dt_ = _default_dtype()
    gyros = jnp.asarray(gyros, dtype=dt_)
    dts = jnp.asarray(dts, dtype=dt_)
    bias_hat = jnp.asarray(bias_hat, dtype=dt_)
    wCov = gyro_sigma ** 2 * jnp.eye(3, dtype=dt_)

    def step(carry, inp):
        R, H, cov, t = carry
        w_meas, dt = inp
        w = (w_meas - bias_hat) * dt
        incr = so3.expmap(w)
        Jr = so3.right_jacobian(w)
        A = incr.T  # ∂(new tangent)/∂(old tangent) ≈ Ad(incr⁻¹)
        newH = A @ H - Jr * dt
        new_cov = A @ cov @ A.T + Jr @ (wCov / dt) @ Jr.T * dt * dt
        return (R @ incr, newH, new_cov, t + dt), None

    (R, H, cov, t), _ = jax.lax.scan(
        step,
        (jnp.eye(3, dtype=dt_), jnp.zeros((3, 3), dtype=dt_),
         jnp.zeros((3, 3), dtype=dt_), jnp.zeros((), dtype=dt_)),
        (gyros, dts))
    return PreintegratedRotation(R, H, cov, bias_hat, t)


def ahrs_predict(rot_i, bias, pim: PreintegratedRotation):
    """AHRSFactor::Predict: Rj = Ri · ΔR̃ · Exp(H·(b − b̂))."""
    corrected = pim.deltaR @ so3.expmap(pim.H_bias @ (bias - pim.bias_hat))
    return rot_i @ corrected


def ahrs_factors(keys_ri, keys_rj, keys_bias, pims, name=None):
    """AHRSFactor batch (gtsam/navigation/AHRSFactor.h): residual =
    Log(predict(Ri,b)⁻¹ · Rj), whitened by the preintegrated covariance."""
    keys = np.stack([np.asarray(keys_ri), np.asarray(keys_rj),
                     np.asarray(keys_bias)], axis=1)
    deltaR = jnp.stack([p.deltaR for p in pims])
    H = jnp.stack([p.H_bias for p in pims])
    bh = jnp.stack([p.bias_hat for p in pims])
    covs = np.stack([np.asarray(p.cov) for p in pims])

    def fn(xs, meas):
        dR, Hb, bhat = meas
        Ri, Rj, bias = xs
        pred = Ri @ dR @ so3.expmap(Hb @ (bias - bhat))
        return so3.logmap(so3.between(pred, Rj))

    return factors_mod.custom_factors(
        name or "AHRS", ("SO3", "SO3", "Vec3"), keys, fn, 3,
        (deltaR, H, bh), noise_mod.covariance(covs))
