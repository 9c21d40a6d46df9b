"""Long-tail SLAM factor families from the reference's slam/ and unstable/slam.

Each constructor returns one typed FactorBatch (struct-of-arrays over N factors)
whose residual is vmapped and differentiated by JAX — the TPU-native analog of the
reference's per-object virtual `evaluateError` with hand-written Jacobians.

Reference parity targets (cited per function):
  gtsam/slam/{BoundingConstraint,RotateFactor,ReferenceFrameFactor,FrobeniusFactor}.h
  gtsam_unstable/slam/{PartialPriorFactor,BetweenFactorEM,TOAFactor,
                       InvDepthFactorVariant1,ProjectionFactorRollingShutter}.h
  gtsam_unstable/geometry/Event.h, gtsam_unstable/dynamics/{PoseRTV,VelocityConstraint}.h
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..base import noise as noise_mod
from ..geometry import se3, so3, unit3
from ..geometry import cameras as cam_mod
from ..graph import factors as factors_mod
from ..graph import manifolds


# ---------------------------------------------------------------------------
# PartialPriorFactor (gtsam_unstable/slam/PartialPriorFactor.h): prior on a
# subset of tangent-space coordinates Log(x)[indices].
# ---------------------------------------------------------------------------

def partial_prior_factors(tname: str, keys, indices, priors, noise):
    """Prior on tangent coordinates `indices` of Log(x).  indices is static
    (one batch per index-set, the typed-batch analog of per-factor index lists)."""
    mt = manifolds.get(tname)
    idx = jnp.asarray(np.asarray(indices, dtype=np.int32))
    ident = mt.identity()

    def fn(xs, prior):
        full = mt.local(ident, xs[0])
        return full[idx] - prior

    return factors_mod.custom_factors(
        f"PartialPrior{tname}", (tname,), np.asarray(keys).reshape(-1, 1),
        fn, int(idx.shape[0]), jnp.atleast_2d(jnp.asarray(priors)), noise)


# ---------------------------------------------------------------------------
# BoundingConstraint (gtsam/slam/BoundingConstraint.h): scalar inequality
# value(x) >= / <= threshold.  The reference gates the factor with active();
# the batched functional analog is a one-sided hinge residual (zero when
# satisfied, linear in the violation when active) — same objective value and
# gradient wherever the reference factor is active.
# ---------------------------------------------------------------------------

def bounding_constraints_1(tname: str, keys, value_fn, thresholds,
                           is_greater_than=True, mu: float = 1000.0):
    noise = noise_mod.isotropic(1, 1.0 / np.sqrt(mu))

    def fn(xs, thr):
        v = value_fn(xs[0]) - thr
        act = jnp.minimum(v, 0.0) if is_greater_than else jnp.maximum(v, 0.0)
        return jnp.reshape(act, (1,))

    return factors_mod.custom_factors(
        f"Bound{tname}", (tname,), np.asarray(keys).reshape(-1, 1),
        fn, 1, jnp.asarray(thresholds).reshape(-1), noise)


def bounding_constraints_2(tnames, keys1, keys2, value_fn, thresholds,
                           is_greater_than=True, mu: float = 1000.0):
    noise = noise_mod.isotropic(1, 1.0 / np.sqrt(mu))
    keys = np.stack([np.asarray(keys1), np.asarray(keys2)], axis=1)

    def fn(xs, thr):
        v = value_fn(xs[0], xs[1]) - thr
        act = jnp.minimum(v, 0.0) if is_greater_than else jnp.maximum(v, 0.0)
        return jnp.reshape(act, (1,))

    return factors_mod.custom_factors(
        "Bound2", tuple(tnames), keys, fn, 1,
        jnp.asarray(thresholds).reshape(-1), noise)


# ---------------------------------------------------------------------------
# RotateFactor / RotateDirectionsFactor (gtsam/slam/RotateFactor.h):
# estimate iRc from rotated axis-angle pairs p = iRc * z (as vectors), or
# from direction pairs on S^2.
# ---------------------------------------------------------------------------

def rotate_factors(keys, P, Z, noise):
    """residual = R·log(Z) − log(P), reference RotateFactor.h evaluateError."""
    p = jax.vmap(so3.logmap)(jnp.asarray(P).reshape(-1, 3, 3))
    z = jax.vmap(so3.logmap)(jnp.asarray(Z).reshape(-1, 3, 3))

    def fn(xs, meas):
        pz, zz = meas
        return so3.rotate(xs[0], zz) - pz

    return factors_mod.custom_factors(
        "Rotate", ("SO3",), np.asarray(keys).reshape(-1, 1),
        fn, 3, (p, z), noise)


def rotate_directions_factors(keys, i_p, c_z, noise):
    """residual = tangent error of (R·c_z) vs measured direction i_p (Unit3)."""
    def fn(xs, meas):
        pm, zm = meas
        q = so3.rotate(xs[0], zm)
        return unit3.error_vector(pm, q / jnp.linalg.norm(q))

    return factors_mod.custom_factors(
        "RotateDirections", ("SO3",), np.asarray(keys).reshape(-1, 1),
        fn, 2, (jnp.asarray(i_p).reshape(-1, 3), jnp.asarray(c_z).reshape(-1, 3)),
        noise)


# ---------------------------------------------------------------------------
# ReferenceFrameFactor (gtsam/slam/ReferenceFrameFactor.h): ternary
# (global, transform, local) with local ≈ transform * global.
# ---------------------------------------------------------------------------

def reference_frame_point_factors(global_keys, trans_keys, local_keys, noise):
    keys = np.stack([np.asarray(global_keys), np.asarray(trans_keys),
                     np.asarray(local_keys)], axis=1)

    def fn(xs, _):
        g, T, l = xs
        return se3.transform_from(T, g) - l

    n = keys.shape[0]
    return factors_mod.custom_factors(
        "ReferenceFramePoint3", ("Point3", "SE3", "Point3"), keys,
        fn, 3, jnp.zeros((n, 0)), noise)


def reference_frame_pose_factors(global_keys, trans_keys, local_keys, noise):
    keys = np.stack([np.asarray(global_keys), np.asarray(trans_keys),
                     np.asarray(local_keys)], axis=1)

    def fn(xs, _):
        g, T, l = xs
        return se3.local(l, se3.compose(T, g))

    n = keys.shape[0]
    return factors_mod.custom_factors(
        "ReferenceFramePose3", ("SE3", "SE3", "SE3"), keys,
        fn, 6, jnp.zeros((n, 0)), noise)


# ---------------------------------------------------------------------------
# FrobeniusFactor / FrobeniusBetweenFactor (gtsam/slam/FrobeniusFactor.h):
# chordal-distance rotation factors (the Shonan building block, exposed at the
# slam surface like the reference).
# ---------------------------------------------------------------------------

def frobenius_factors(keys1, keys2, noise=None):
    """‖vec(R1 − R2)‖² — FrobeniusFactor<Rot3>."""
    keys = np.stack([np.asarray(keys1), np.asarray(keys2)], axis=1)

    def fn(xs, _):
        return (xs[0] - xs[1]).reshape(9)

    n = keys.shape[0]
    return factors_mod.custom_factors(
        "FrobeniusSO3", ("SO3", "SO3"), keys, fn, 9,
        jnp.zeros((n, 0)), noise or noise_mod.unit())


def frobenius_between_factors(keys1, keys2, R12, noise=None):
    """‖vec(R1·R̃12 − R2)‖² — FrobeniusBetweenFactor<Rot3> (FrobeniusFactor.h)."""
    keys = np.stack([np.asarray(keys1), np.asarray(keys2)], axis=1)

    def fn(xs, meas):
        return (so3.compose(xs[0], meas) - xs[1]).reshape(9)

    return factors_mod.custom_factors(
        "FrobeniusBetweenSO3", ("SO3", "SO3"), keys, fn, 9,
        jnp.asarray(R12).reshape(-1, 3, 3), noise or noise_mod.unit())


# ---------------------------------------------------------------------------
# BetweenFactorEM (gtsam_unstable/slam/BetweenFactorEM.h): outlier-robust
# between with explicit inlier/outlier Gaussians.  E-step posterior weights
# (stop-gradient, as in EM) scale the two whitened residual blocks, so the
# M-step objective is the exact EM surrogate.
# ---------------------------------------------------------------------------

def between_factors_em(tname: str, keys1, keys2, measurements,
                       sigmas_inlier, sigmas_outlier, prior_inlier=0.5,
                       name=None):
    mt = manifolds.get(tname)
    d = mt.dim
    w_in = jnp.asarray(1.0 / np.asarray(sigmas_inlier, dtype=np.float64))
    w_out = jnp.asarray(1.0 / np.asarray(sigmas_outlier, dtype=np.float64))
    log_prior_in = float(np.log(prior_inlier))
    log_prior_out = float(np.log(1.0 - prior_inlier))
    log_norm_in = float(np.sum(np.log(np.asarray(w_in))))
    log_norm_out = float(np.sum(np.log(np.asarray(w_out))))
    res = factors_mod._between_residual(tname)

    def fn(xs, meas):
        e = res(xs, meas)
        ein = w_in * e
        eout = w_out * e
        ll_in = log_prior_in + log_norm_in - 0.5 * jnp.sum(ein * ein)
        ll_out = log_prior_out + log_norm_out - 0.5 * jnp.sum(eout * eout)
        lse = jnp.logaddexp(ll_in, ll_out)
        p_in = jax.lax.stop_gradient(jnp.exp(ll_in - lse))
        p_out = 1.0 - p_in
        return jnp.concatenate([jnp.sqrt(p_in) * ein, jnp.sqrt(p_out) * eout])

    keys = np.stack([np.asarray(keys1), np.asarray(keys2)], axis=1)
    return factors_mod.custom_factors(
        name or f"BetweenEM{tname}", (tname, tname), keys, fn, 2 * d,
        measurements, noise_mod.unit())


# ---------------------------------------------------------------------------
# Event + TOAFactor (gtsam_unstable/geometry/Event.h, slam/TOAFactor.h):
# sound-source localization.  Event = (time, Point3) as a 4-dof vector
# manifold; TOA residual = t_event + ‖x_event − sensor‖/speed − toa.
# ---------------------------------------------------------------------------

EVENT = manifolds.get("Vec4")  # Event.h retract is plain vector addition


def toa_factors(event_keys, sensors, toas, noise, speed: float = 330.0):
    def fn(xs, meas):
        sensor, toa = meas
        ev = xs[0]
        dist = jnp.linalg.norm(ev[1:] - sensor)
        return jnp.reshape(ev[0] + dist / speed - toa, (1,))

    return factors_mod.custom_factors(
        "TOA", ("Vec4",), np.asarray(event_keys).reshape(-1, 1), fn, 1,
        (jnp.asarray(sensors).reshape(-1, 3), jnp.asarray(toas).reshape(-1)),
        noise)


# ---------------------------------------------------------------------------
# InvDepthFactorVariant1 (gtsam_unstable/slam/InvDepthFactorVariant1.h):
# landmark = (x,y,z,theta,phi,rho); world point = anchor + ray(theta,phi)/rho.
# ---------------------------------------------------------------------------

def inv_depth_point(landmark):
    x, y, z, theta, phi, rho = (landmark[..., i] for i in range(6))
    ray = jnp.stack([jnp.cos(theta) * jnp.cos(phi),
                     jnp.sin(theta) * jnp.cos(phi),
                     jnp.sin(phi)], axis=-1)
    return jnp.stack([x, y, z], axis=-1) + ray / rho[..., None]


def inv_depth_factors(pose_keys, landmark_keys, measurements, K, noise):
    keys = np.stack([np.asarray(pose_keys), np.asarray(landmark_keys)], axis=1)
    Kj = jnp.asarray(K)

    def fn(xs, uv):
        point = inv_depth_point(xs[1])
        pred, _ = cam_mod.project_point(xs[0], Kj, point,
                                        cam_mod.uncalibrate_cal3s2)
        return pred - uv

    return factors_mod.custom_factors(
        "InvDepthV1", ("SE3", "Vec6"), keys, fn, 2,
        jnp.asarray(measurements).reshape(-1, 2), noise)


# ---------------------------------------------------------------------------
# ProjectionFactorRollingShutter (gtsam_unstable/slam/
# ProjectionFactorRollingShutter.h): pose interpolated on SE(3) between two
# keyframes by per-measurement alpha.
# ---------------------------------------------------------------------------

def se3_interpolate(Ta, Tb, alpha):
    return se3.compose(Ta, se3.expmap(alpha * se3.logmap(se3.between(Ta, Tb))))


def rolling_shutter_projection_factors(pose_a_keys, pose_b_keys, point_keys,
                                       measurements, alphas, K, noise):
    keys = np.stack([np.asarray(pose_a_keys), np.asarray(pose_b_keys),
                     np.asarray(point_keys)], axis=1)
    Kj = jnp.asarray(K)

    def fn(xs, meas):
        uv, alpha = meas
        pose = se3_interpolate(xs[0], xs[1], alpha)
        pred, _ = cam_mod.project_point(pose, Kj, xs[2],
                                        cam_mod.uncalibrate_cal3s2)
        return pred - uv

    return factors_mod.custom_factors(
        "RollingShutterProj", ("SE3", "SE3", "Point3"), keys, fn, 2,
        (jnp.asarray(measurements).reshape(-1, 2), jnp.asarray(alphas).reshape(-1)),
        noise)


# ---------------------------------------------------------------------------
# PoseRTV dynamics (gtsam_unstable/dynamics/): (R,t,v) 9-dof state rides the
# NavState manifold; VelocityConstraint.h ties p_j = p_i + v·dt (trapezoidal).
# ---------------------------------------------------------------------------

def velocity_constraint_factors(keys_i, keys_j, dts, noise):
    """NavState kinematic constraint: p_j − (p_i + 0.5(v_i+v_j)·dt) = 0."""
    keys = np.stack([np.asarray(keys_i), np.asarray(keys_j)], axis=1)

    def fn(xs, dt):
        si, sj = xs
        return sj.p - (si.p + 0.5 * (si.v + sj.v) * dt)

    return factors_mod.custom_factors(
        "VelocityConstraint", ("NavState", "NavState"), keys, fn, 3,
        jnp.asarray(dts).reshape(-1), noise)


# ---------------------------------------------------------------------------
# WhiteNoiseFactor (gtsam/nonlinear/WhiteNoiseFactor.h): binary factor on
# (mean, log-precision λ) of scalar measurements; negative log-likelihood
# 0.5·log(2π/τ) + 0.5·τ·(z−μ)².  The non-quadratic log-partition term rides in
# a residual as sqrt(log(2π) − λ + 2C): its square is the true objective plus
# a constant C (argmin unchanged), real for all λ < log(2π) + 2C.
# ---------------------------------------------------------------------------

def white_noise_factors(mean_keys, logprec_keys, measurements):
    keys = np.stack([np.asarray(mean_keys), np.asarray(logprec_keys)], axis=1)
    c0 = float(np.log(2.0 * np.pi)) + 4.0  # valid up to precision ~e^6 (σ ≳ 0.05)

    def fn(xs, z):
        mu = jnp.reshape(xs[0], ())   # Scalar manifold elements are 0-d
        lam = jnp.reshape(xs[1], ())
        r1 = jnp.exp(0.5 * lam) * (z - mu)
        r2 = jnp.sqrt(jnp.maximum(c0 - lam, 1e-9))
        return jnp.stack([r1, r2])

    return factors_mod.custom_factors(
        "WhiteNoise", ("Scalar", "Scalar"), keys, fn, 2,
        jnp.asarray(measurements).reshape(-1), noise_mod.unit())


# FunctorizedFactor (gtsam/nonlinear/FunctorizedFactor.h) — a factor from any
# callable; under autodiff this is exactly custom_factors.
functorized_factors = factors_mod.custom_factors
