"""IMU preintegration on the 9-dim tangent (TangentPreintegration) as lax.scan.

Reference: gtsam/navigation/TangentPreintegration.cpp:54 UpdatePreintegrated,
ImuFactor.cpp:53 covariance propagation, PreintegrationBase.cpp:115 predict /
141 computeError, NavState.cpp:258 correctPIM.

TPU-native twist: the hot sequential per-sample loop is a lax.scan, and the A/B/C
step Jacobians (reference hand-derives them) come from forward-mode autodiff of
the step function — exact, and fused by XLA into the scan body.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype

from ..geometry import so3
from .navstate import NavState, local as nav_local, retract as nav_retract


@dataclasses.dataclass(frozen=True)
class PreintegrationParams:
    """gtsam/navigation/PreintegrationParams.h (MakeSharedU-style defaults)."""

    accel_sigma: float = 0.01        # continuous-time accelerometer sigma
    gyro_sigma: float = 0.001
    integration_sigma: float = 1e-8  # position integration noise
    gravity: tuple = (0.0, 0.0, -9.81)
    bias_acc_sigma: float = 0.1      # bias random walk (CombinedImuFactor)
    bias_omega_sigma: float = 0.01
    bias_acc_omega_init: float = 1e-1
    # earth-rotation (Coriolis) correction, nav frame; None disables
    # (PreintegrationParams.h omegaCoriolis / use2ndOrderCoriolis)
    omega_coriolis: Optional[tuple] = None
    use_2nd_order_coriolis: bool = False


class PIM(NamedTuple):
    """Preintegrated IMU measurements (PreintegratedImuMeasurements analog)."""

    zeta: jnp.ndarray          # (9,) = [theta, dp, dv] at bias_hat
    H_bias_acc: jnp.ndarray    # (9, 3)
    H_bias_omega: jnp.ndarray  # (9, 3)
    cov: jnp.ndarray           # (9, 9) preintMeasCov
    bias_hat: jnp.ndarray      # (6,) = [acc(3), gyro(3)]
    delta_t: jnp.ndarray       # scalar


def _update_zeta(zeta, a_body, w_body, dt):
    """UpdatePreintegrated (TangentPreintegration.cpp:54): exact mean."""
    theta, pos, vel = zeta[:3], zeta[3:6], zeta[6:]
    Jr_inv = jnp.linalg.inv(so3.right_jacobian(theta))
    w_tangent = Jr_inv @ w_body
    R = so3.expmap(theta)
    a_nav = R @ a_body
    dt22 = 0.5 * dt * dt
    return jnp.concatenate([
        theta + w_tangent * dt,
        pos + vel * dt + a_nav * dt22,
        vel + a_nav * dt,
    ])


def preintegrate(accs, gyros, dts, bias_hat, params: PreintegrationParams) -> PIM:
    """Integrate a (T,3),(T,3),(T,) measurement stream at fixed bias estimate."""
    dt_acc = _default_dtype()
    accs = jnp.asarray(accs, dtype=dt_acc)
    gyros = jnp.asarray(gyros, dtype=dt_acc)
    dts = jnp.asarray(dts, dtype=dt_acc)
    bias_hat = jnp.asarray(bias_hat, dtype=dt_acc)
    aCov = params.accel_sigma ** 2 * jnp.eye(3, dtype=dt_acc)
    wCov = params.gyro_sigma ** 2 * jnp.eye(3, dtype=dt_acc)
    iCov = params.integration_sigma ** 2 * jnp.eye(3, dtype=dt_acc)

    def step(carry, inp):
        zeta, Ha, Hw, cov, t = carry
        a_meas, w_meas, dt = inp
        a = a_meas - bias_hat[:3]
        w = w_meas - bias_hat[3:]
        # A, B, C from autodiff of the exact update (reference hand-derives)
        A = jax.jacfwd(_update_zeta, argnums=0)(zeta, a, w, dt)
        B = jax.jacfwd(_update_zeta, argnums=1)(zeta, a, w, dt)
        C = jax.jacfwd(_update_zeta, argnums=2)(zeta, a, w, dt)
        new_zeta = _update_zeta(zeta, a, w, dt)
        new_cov = A @ cov @ A.T + B @ (aCov / dt) @ B.T + C @ (wCov / dt) @ C.T
        new_cov = new_cov.at[3:6, 3:6].add(iCov * dt)
        new_Ha = A @ Ha - B
        new_Hw = A @ Hw - C
        return (new_zeta, new_Ha, new_Hw, new_cov, t + dt), None

    z0 = jnp.zeros(9, dtype=dt_acc)
    H0 = jnp.zeros((9, 3), dtype=dt_acc)
    cov0 = jnp.zeros((9, 9), dtype=dt_acc)
    (zeta, Ha, Hw, cov, t), _ = jax.lax.scan(
        step, (z0, H0, H0, cov0, jnp.zeros((), dtype=dt_acc)),
        (accs, gyros, dts))
    return PIM(zeta, Ha, Hw, cov, bias_hat, t)


def merge(pim1: PIM, pim2: PIM) -> PIM:
    """TangentPreintegration::Compose/mergeWith analog: chain two PIMs
    (same bias_hat).  zeta composition via predict-style update."""
    t1, t2 = pim1.delta_t, pim2.delta_t

    def compose_zeta(z1, z2):
        th1, p1, v1 = z1[:3], z1[3:6], z1[6:]
        th2, p2, v2 = z2[:3], z2[3:6], z2[6:]
        R1 = so3.expmap(th1)
        th = so3.logmap(R1 @ so3.expmap(th2))
        p = p1 + v1 * t2 + R1 @ p2
        v = v1 + R1 @ v2
        return jnp.concatenate([th, p, v])

    zeta = compose_zeta(pim1.zeta, pim2.zeta)
    A1 = jax.jacfwd(compose_zeta, argnums=0)(pim1.zeta, pim2.zeta)
    A2 = jax.jacfwd(compose_zeta, argnums=1)(pim1.zeta, pim2.zeta)
    cov = A1 @ pim1.cov @ A1.T + A2 @ pim2.cov @ A2.T
    Ha = A1 @ pim1.H_bias_acc + A2 @ pim2.H_bias_acc
    Hw = A1 @ pim1.H_bias_omega + A2 @ pim2.H_bias_omega
    return PIM(zeta, Ha, Hw, cov, pim1.bias_hat, t1 + t2)


class CombinedPIM(NamedTuple):
    """PreintegratedCombinedMeasurements: PIM + full 15x15 covariance over
    [zeta(9); bias_acc(3); bias_gyro(3)] including in-interval bias random walk
    (gtsam/navigation/CombinedImuFactor.{h,cpp})."""

    pim: PIM
    cov15: jnp.ndarray  # (15, 15)


def preintegrate_combined(accs, gyros, dts, bias_hat,
                          params: PreintegrationParams) -> CombinedPIM:
    """Combined preintegration: the zeta scan of `preintegrate` plus joint
    (zeta, bias) covariance propagation F P F^T + G Q G^T."""
    dt_acc = _default_dtype()
    accs = jnp.asarray(accs, dtype=dt_acc)
    gyros = jnp.asarray(gyros, dtype=dt_acc)
    dts = jnp.asarray(dts, dtype=dt_acc)
    bias_hat = jnp.asarray(bias_hat, dtype=dt_acc)
    aCov = params.accel_sigma ** 2 * jnp.eye(3, dtype=dt_acc)
    wCov = params.gyro_sigma ** 2 * jnp.eye(3, dtype=dt_acc)
    iCov = params.integration_sigma ** 2 * jnp.eye(3, dtype=dt_acc)
    baCov = params.bias_acc_sigma ** 2 * jnp.eye(3, dtype=dt_acc)
    bwCov = params.bias_omega_sigma ** 2 * jnp.eye(3, dtype=dt_acc)

    def step(carry, inp):
        zeta, Ha, Hw, P, t = carry
        a_meas, w_meas, dt = inp
        a = a_meas - bias_hat[:3]
        w = w_meas - bias_hat[3:]
        A = jax.jacfwd(_update_zeta, argnums=0)(zeta, a, w, dt)
        B = jax.jacfwd(_update_zeta, argnums=1)(zeta, a, w, dt)
        C = jax.jacfwd(_update_zeta, argnums=2)(zeta, a, w, dt)
        new_zeta = _update_zeta(zeta, a, w, dt)
        # F: zeta depends on bias error through -B, -C; bias errors persist
        F = jnp.block([
            [A, -B, -C],
            [jnp.zeros((6, 9), dtype=dt_acc), jnp.eye(6, dtype=dt_acc)],
        ])
        Q = jnp.zeros((15, 15), dtype=dt_acc)
        Q = Q.at[:9, :9].set(B @ (aCov / dt) @ B.T + C @ (wCov / dt) @ C.T)
        Q = Q.at[3:6, 3:6].add(iCov * dt)
        Q = Q.at[9:12, 9:12].set(baCov * dt)
        Q = Q.at[12:15, 12:15].set(bwCov * dt)
        new_P = F @ P @ F.T + Q
        new_Ha = A @ Ha - B
        new_Hw = A @ Hw - C
        return (new_zeta, new_Ha, new_Hw, new_P, t + dt), None

    z0 = jnp.zeros(9, dtype=dt_acc)
    H0 = jnp.zeros((9, 3), dtype=dt_acc)
    # initial bias uncertainty (p().biasAccOmegaInt analog) keeps cov15 nonsingular
    P0 = jnp.zeros((15, 15), dtype=dt_acc)
    P0 = P0.at[9:, 9:].set(params.bias_acc_omega_init ** 2 *
                           jnp.eye(6, dtype=dt_acc))
    (zeta, Ha, Hw, P, t), _ = jax.lax.scan(
        step, (z0, H0, H0, P0, jnp.zeros((), dtype=dt_acc)),
        (accs, gyros, dts))
    pim = PIM(zeta, Ha, Hw, P[:9, :9], bias_hat, t)
    return CombinedPIM(pim, P)


def bias_corrected_delta(pim: PIM, bias):
    """TangentPreintegration::biasCorrectedDelta (first-order in bias change)."""
    incr = bias - pim.bias_hat
    return (pim.zeta + pim.H_bias_acc @ incr[:3] + pim.H_bias_omega @ incr[3:])


def coriolis(state: NavState, dt, omega, second_order: bool = False):
    """NavState::coriolis (NavState.cpp:214): earth-rotation correction.

    Perturbations are formed in the nav frame (-dt*omega rotation drag,
    -dt^2 omega x v position, -2 dt omega x v velocity, optional centripetal
    omega x omega x t second-order terms) then unrotated into the body frame,
    matching the reference exactly."""
    omega = jnp.asarray(omega, dtype=state.p.dtype)
    dt2 = dt * dt
    omega_cross_vel = jnp.cross(omega, state.v)
    n_dR = (-dt) * omega
    n_dP = (-dt2) * omega_cross_vel
    n_dV = (-2.0 * dt) * omega_cross_vel
    if second_order:
        omega_cross2_t = jnp.cross(omega, jnp.cross(omega, state.p))
        n_dP = n_dP - (0.5 * dt2) * omega_cross2_t
        n_dV = n_dV - dt * omega_cross2_t
    Rt = jnp.swapaxes(state.R, -1, -2)
    return jnp.concatenate([Rt @ n_dR, Rt @ n_dP, Rt @ n_dV])


def correct_pim(state_i: NavState, zeta, dt, gravity,
                omega_coriolis: Optional[jnp.ndarray] = None,
                use_2nd_order_coriolis: bool = False):
    """NavState::correctPIM (NavState.cpp:258): gravity/initial-velocity terms
    plus the optional Coriolis correction (NavState.cpp:274-276)."""
    g = jnp.asarray(gravity, dtype=zeta.dtype)
    dt22 = 0.5 * dt * dt
    Rt = jnp.swapaxes(state_i.R, -1, -2)
    dR = zeta[:3]
    dP = zeta[3:6] + dt * (Rt @ state_i.v) + dt22 * (Rt @ g)
    dV = zeta[6:] + dt * (Rt @ g)
    xi = jnp.concatenate([dR, dP, dV])
    if omega_coriolis is not None:
        xi = xi + coriolis(state_i, dt, omega_coriolis,
                           use_2nd_order_coriolis)
    return xi


def predict(state_i: NavState, bias, pim: PIM, params: PreintegrationParams,
            omega_coriolis=None) -> NavState:
    """PreintegrationBase::predict (PreintegrationBase.cpp:115)."""
    zeta = bias_corrected_delta(pim, bias)
    oc = omega_coriolis if omega_coriolis is not None else params.omega_coriolis
    xi = correct_pim(state_i, zeta, pim.delta_t, params.gravity, oc,
                     params.use_2nd_order_coriolis)
    return nav_retract(state_i, xi)


def compute_error(state_i: NavState, state_j: NavState, bias, pim: PIM,
                  params: PreintegrationParams) -> jnp.ndarray:
    """PreintegrationBase::computeError: state_j.localCoordinates(predicted)."""
    predicted = predict(state_i, bias, pim, params)
    return nav_local(state_j, predicted)


def _manifold_step(state: NavState, a_body, w_body, dt):
    """ManifoldPreintegration::update (gtsam/navigation/
    ManifoldPreintegration.cpp:51): integrate ΔXij directly on the NavState
    manifold (Forster RSS'15), gravity excluded."""
    Rk = state.R
    R_next = Rk @ so3.expmap(w_body * dt)
    p_next = state.p + state.v * dt + so3.rotate(Rk, a_body) * (0.5 * dt * dt)
    v_next = state.v + so3.rotate(Rk, a_body) * dt
    return NavState(R_next, p_next, v_next)


def preintegrate_manifold(accs, gyros, dts, bias_hat,
                          params: PreintegrationParams) -> PIM:
    """ManifoldPreintegration backend (GTSAM_TANGENT_PREINTEGRATION=OFF path).

    Integrates on the NavState manifold; covariance and bias Jacobians are
    propagated in the tangent space via autodiff of the retract/local-conjugated
    step — so the returned PIM is interchangeable with the tangent backend's
    (zeta = Log-coordinates of ΔXij) and plugs into the same ImuFactor batches.
    """
    dt_ = _default_dtype()
    accs = jnp.asarray(accs, dtype=dt_)
    gyros = jnp.asarray(gyros, dtype=dt_)
    dts = jnp.asarray(dts, dtype=dt_)
    bias_hat = jnp.asarray(bias_hat, dtype=dt_)
    aCov = params.accel_sigma ** 2 * jnp.eye(3, dtype=dt_)
    wCov = params.gyro_sigma ** 2 * jnp.eye(3, dtype=dt_)
    iCov = params.integration_sigma ** 2 * jnp.eye(3, dtype=dt_)
    ident = NavState(jnp.eye(3, dtype=dt_), jnp.zeros(3, dtype=dt_),
                     jnp.zeros(3, dtype=dt_))

    def step(carry, inp):
        state, Ha, Hw, cov, t = carry
        a_meas, w_meas, dt = inp
        a = a_meas - bias_hat[:3]
        w = w_meas - bias_hat[3:]
        new_state = _manifold_step(state, a, w, dt)

        # tangent-space linearization of the manifold step, by autodiff
        def tangent_step(xi, da, dw):
            nxt = _manifold_step(nav_retract(state, xi), a + da, w + dw, dt)
            return nav_local(new_state, nxt)

        z3 = jnp.zeros(3, dtype=dt_)
        A = jax.jacfwd(tangent_step, argnums=0)(jnp.zeros(9, dtype=dt_), z3, z3)
        B = jax.jacfwd(tangent_step, argnums=1)(jnp.zeros(9, dtype=dt_), z3, z3)
        C = jax.jacfwd(tangent_step, argnums=2)(jnp.zeros(9, dtype=dt_), z3, z3)
        new_cov = A @ cov @ A.T + B @ (aCov / dt) @ B.T + C @ (wCov / dt) @ C.T
        new_cov = new_cov.at[3:6, 3:6].add(iCov * dt)
        return (new_state, A @ Ha - B, A @ Hw - C, new_cov, t + dt), None

    H0 = jnp.zeros((9, 3), dtype=dt_)
    cov0 = jnp.zeros((9, 9), dtype=dt_)
    (state, Ha, Hw, cov, t), _ = jax.lax.scan(
        step, (ident, H0, H0, cov0, jnp.zeros((), dtype=dt_)),
        (accs, gyros, dts))
    zeta = nav_local(ident, state)
    return PIM(zeta, Ha, Hw, cov, bias_hat, t)
