"""Kalman filters: linear KF and EKF.

Reference: gtsam/linear/KalmanFilter.h:41 (predict:104, update:135) — the
reference implements KF as elimination on two-step graphs; the closed-form
equations below are algebraically identical, batched and jit-friendly.
ExtendedKalmanFilter: gtsam/nonlinear/ExtendedKalmanFilter-inl.h, with
Jacobians from forward-mode autodiff on manifold-perturbed models.
"""

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class GaussianState(NamedTuple):
    mean: jnp.ndarray   # (n,)
    cov: jnp.ndarray    # (n, n)


def kf_init(x0, P0) -> GaussianState:
    return GaussianState(jnp.asarray(x0), jnp.asarray(P0))


def kf_predict(state: GaussianState, F, B, u, Q) -> GaussianState:
    """x' = F x + B u + w, w ~ N(0, Q)  (KalmanFilter::predict)."""
    x = F @ state.mean + (B @ u if B is not None else 0.0)
    P = F @ state.cov @ F.T + Q
    return GaussianState(x, P)


def kf_update(state: GaussianState, H, z, R) -> GaussianState:
    """z = H x + v, v ~ N(0, R)  (KalmanFilter::update)."""
    y = z - H @ state.mean
    S = H @ state.cov @ H.T + R
    K = jnp.linalg.solve(S, H @ state.cov).T
    x = state.mean + K @ y
    n = state.mean.shape[0]
    IKH = jnp.eye(n, dtype=x.dtype) - K @ H
    # Joseph form (numerically symmetric-PSD)
    P = IKH @ state.cov @ IKH.T + K @ R @ K.T
    return GaussianState(x, P)


def kf_smoother(filt_means, filt_covs, pred_means, pred_covs, F):
    """RTS smoother (scan-based).

    filt_*: (T, ...) filtered estimates; pred_*[k]: prediction of step k made
    from step k-1 (pred_*[0] unused).  Returns smoothed (T, ...) arrays.
    """
    def backward(carry, inp):
        xs, Ps = carry
        xf, Pf, xp_next, Pp_next = inp
        C = jnp.linalg.solve(Pp_next, F @ Pf).T
        x = xf + C @ (xs - xp_next)
        P = Pf + C @ (Ps - Pp_next) @ C.T
        return (x, P), (x, P)

    init = (filt_means[-1], filt_covs[-1])
    inputs = (filt_means[:-1][::-1], filt_covs[:-1][::-1],
              pred_means[1:][::-1], pred_covs[1:][::-1])
    _, (xs, Ps) = jax.lax.scan(backward, init, inputs)
    means = jnp.concatenate([xs[::-1], filt_means[-1:]])
    covs = jnp.concatenate([Ps[::-1], filt_covs[-1:]])
    return means, covs


@dataclasses.dataclass
class ExtendedKalmanFilter:
    """Nonlinear EKF over a manifold type (retract/local callables).

    motion:      f(x, u) -> x_pred (on manifold)
    measurement: h(x) -> z
    Jacobians via jacfwd on tangent perturbations.
    """

    retract: Callable
    local: Callable
    dim: int

    def predict(self, state: GaussianState, x_repr, f, Q):
        """state.mean is a tangent delta around x_repr (kept at zero);
        returns (new x_repr, GaussianState with zero mean)."""
        x_new = f(x_repr)
        F = jax.jacfwd(
            lambda d: self.local(x_new, f(self.retract(x_repr, d))))(
                jnp.zeros(self.dim))
        P = F @ state.cov @ F.T + Q
        return x_new, GaussianState(jnp.zeros(self.dim), P)

    def update(self, state: GaussianState, x_repr, h, z, R):
        H = jax.jacfwd(lambda d: h(self.retract(x_repr, d)))(jnp.zeros(self.dim))
        y = z - h(x_repr)
        S = H @ state.cov @ H.T + R
        K = jnp.linalg.solve(S, H @ state.cov).T
        delta = K @ y
        x_new = self.retract(x_repr, delta)
        n = self.dim
        IKH = jnp.eye(n) - K @ H
        P = IKH @ state.cov @ IKH.T + K @ R @ K.T
        return x_new, GaussianState(jnp.zeros(n), P)
