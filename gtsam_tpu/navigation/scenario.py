"""Analytic IMU test scenarios + runner — gtsam/navigation/Scenario.h and
ScenarioRunner.{h,cpp}: closed-form trajectories whose exact angular velocity
and specific force feed the preintegration pipeline, the navigation module's
test harness (Monte-Carlo covariance consistency, testImuFactor.cpp).

TPU-native shape: a Scenario is a pair of vectorized functions (pose(t),
kinematics at t); the runner samples a whole trajectory at once and calls the
lax.scan preintegration on the stacked measurement arrays — one device
program, not a per-sample loop.
"""

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..geometry import se3, so3
from .navstate import NavState
from . import preintegration as pre


@dataclasses.dataclass(frozen=True)
class Scenario:
    """Analytic trajectory: all functions take scalar/vector t (seconds)."""

    pose: Callable        # t -> (R (...,3,3), p (...,3))
    omega_b: Callable     # t -> (...,3) angular velocity in body frame
    velocity_n: Callable  # t -> (...,3) velocity in nav frame
    acceleration_n: Callable  # t -> (...,3) acceleration in nav frame

    def rotation(self, t):
        return self.pose(t)[0]

    def velocity_b(self, t):
        R = self.rotation(t)
        return jnp.einsum("...ji,...j->...i", R, self.velocity_n(t))

    def acceleration_b(self, t):
        R = self.rotation(t)
        return jnp.einsum("...ji,...j->...i", R, self.acceleration_n(t))

    def nav_state(self, t) -> NavState:
        R, p = self.pose(t)
        return NavState(R, p, self.velocity_n(t))


def constant_twist(w, v, R0=None, p0=None) -> Scenario:
    """ConstantTwistScenario (Scenario.h:60): body frame moves with constant
    twist [w; v]; centripetal acceleration a_b = w x v is constant in body."""
    w = jnp.asarray(w, dtype=_default_dtype())
    v = jnp.asarray(v, dtype=w.dtype)
    R0 = jnp.eye(3, dtype=w.dtype) if R0 is None else jnp.asarray(R0)
    p0 = jnp.zeros(3, dtype=w.dtype) if p0 is None else jnp.asarray(p0)
    a_b = jnp.cross(w, v)
    twist = jnp.concatenate([w, v])

    def pose(t):
        t = jnp.asarray(t)
        T = jax.vmap(se3.expmap)(t.reshape(-1, 1) * twist) \
            if t.ndim else se3.expmap(t * twist)
        R = R0 @ T.R if t.ndim == 0 else jnp.einsum("ij,kjl->kil", R0, T.R)
        p = p0 + jnp.einsum("ij,...j->...i", R0, T.t)
        return R, p

    def omega_b(t):
        t = jnp.asarray(t)
        return jnp.broadcast_to(w, t.shape + (3,))

    def velocity_n(t):
        R = pose(t)[0]
        return jnp.einsum("...ij,j->...i", R, v)

    def acceleration_n(t):
        R = pose(t)[0]
        return jnp.einsum("...ij,j->...i", R, a_b)

    return Scenario(pose, omega_b, velocity_n, acceleration_n)


def accelerating(R_nb, p0, v0, a_n, omega_b=(0.0, 0.0, 0.0)) -> Scenario:
    """AcceleratingScenario (Scenario.h:83): constant nav-frame acceleration
    with optional constant body angular velocity."""
    R_nb = jnp.asarray(R_nb, dtype=_default_dtype())
    p0 = jnp.asarray(p0, dtype=R_nb.dtype)
    v0 = jnp.asarray(v0, dtype=R_nb.dtype)
    a_n = jnp.asarray(a_n, dtype=R_nb.dtype)
    w_b = jnp.asarray(omega_b, dtype=R_nb.dtype)

    def pose(t):
        t = jnp.asarray(t)
        if t.ndim:
            R = jnp.einsum("ij,kjl->kil", R_nb,
                           jax.vmap(so3.expmap)(t[:, None] * w_b))
        else:
            R = R_nb @ so3.expmap(t * w_b)
        p = p0 + v0 * jnp.asarray(t)[..., None] \
            + 0.5 * a_n * (jnp.asarray(t) ** 2)[..., None]
        return R, p

    def omega_fn(t):
        t = jnp.asarray(t)
        return jnp.broadcast_to(w_b, t.shape + (3,))

    def velocity_n(t):
        t = jnp.asarray(t)
        return v0 + a_n * t[..., None] if t.ndim else v0 + a_n * t

    def acceleration_n(t):
        t = jnp.asarray(t)
        return jnp.broadcast_to(a_n, t.shape + (3,))

    return Scenario(pose, omega_fn, velocity_n, acceleration_n)


class ScenarioRunner:
    """ScenarioRunner.h: sample exact IMU measurements from a scenario, add
    bias + discrete noise, and preintegrate (vectorized; one scan)."""

    def __init__(self, scenario: Scenario,
                 params: Optional[pre.PreintegrationParams] = None,
                 imu_dt: float = 1.0 / 100.0, bias=None):
        self.scenario = scenario
        self.params = params or pre.PreintegrationParams()
        self.imu_dt = imu_dt
        self.bias = (jnp.zeros(6) if bias is None
                     else jnp.asarray(bias, dtype=_default_dtype()))

    def gravity_n(self):
        return jnp.asarray(self.params.gravity)

    def actual_specific_force(self, t):
        """Accelerometers measure acceleration minus gravity, in body
        (ScenarioRunner.h:76)."""
        R = self.scenario.rotation(jnp.asarray(t))
        g_b = jnp.einsum("...ji,j->...i", R, self.gravity_n())
        return self.scenario.acceleration_b(t) - g_b

    def measured_omega(self, t, rng=None):
        w = self.scenario.omega_b(t) + self.bias[3:]
        if rng is not None:
            sigma = self.params.gyro_sigma / np.sqrt(self.imu_dt)
            w = w + sigma * jnp.asarray(rng.normal(size=np.shape(w)))
        return w

    def measured_specific_force(self, t, rng=None):
        a = self.actual_specific_force(t) + self.bias[:3]
        if rng is not None:
            sigma = self.params.accel_sigma / np.sqrt(self.imu_dt)
            a = a + sigma * jnp.asarray(rng.normal(size=np.shape(a)))
        return a

    def integrate(self, T: float, bias_hat=None, rng=None) -> pre.PIM:
        """Sample [0, T) at imu_dt and preintegrate (ScenarioRunner.h:94)."""
        n = max(1, int(round(T / self.imu_dt)))
        ts = jnp.arange(n) * self.imu_dt
        accs = self.measured_specific_force(ts, rng)
        gyros = self.measured_omega(ts, rng)
        dts = jnp.full((n,), self.imu_dt)
        bias_hat = jnp.zeros(6) if bias_hat is None else jnp.asarray(bias_hat)
        return pre.preintegrate(accs, gyros, dts, bias_hat, self.params)

    def predict(self, pim: pre.PIM, bias=None) -> NavState:
        bias = jnp.zeros(6) if bias is None else jnp.asarray(bias)
        return pre.predict(self.scenario.nav_state(0.0), bias, pim,
                           self.params)

    def estimate_covariance(self, T: float, N: int = 100, bias_hat=None,
                            seed: int = 0):
        """Monte-Carlo covariance of the predicted NavState
        (ScenarioRunner.h:103) — the oracle for preintMeasCov."""
        rng = np.random.default_rng(seed)
        exact = self.scenario.nav_state(T)
        from .navstate import local as nav_local
        samples = []
        for _ in range(N):
            pim = self.integrate(T, bias_hat, rng)
            pred = self.predict(pim)
            samples.append(np.asarray(nav_local(exact, pred)))
        X = np.stack(samples)
        X = X - X.mean(0)
        return X.T @ X / (N - 1)
