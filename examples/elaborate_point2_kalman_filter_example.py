"""elaboratePoint2KalmanFilter analog: the same 2D-point tracking problem as
easyPoint2KalmanFilter, but solved EXPLICITLY as factor-graph elimination —
each predict/update is a two-variable Gaussian graph eliminated to a
conditional + marginal, exactly the reference's "elaborate" formulation.

Reference: examples/elaboratePoint2KalmanFilter.cpp (ExtendedKalmanFilter
internals spelled out: motion factor + eliminate -> P(x1), measurement factor
+ eliminate -> posterior), cross-checked against the closed-form KF.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.linear.kalman import GaussianState, kf_init, kf_predict, \
    kf_update
from gtsam_tpu.nonlinear.marginals import Marginals


def predict_by_elimination(state, u, q_sigma):
    """One predict step as elimination of a 2-variable factor graph:
    prior(x0) + motion(x0 -> x1 = x0 + u), marginalizing x0."""
    graph = gt.FactorGraph()
    graph.add(gt.prior_factors("Point2", [0], np.asarray(state.mean)[None],
                               gt.noise.covariance(
                                   np.asarray(state.cov)[None])))
    graph.add(gt.between_factors("Point2", [0], [1],
                                 jnp.asarray(u)[None],
                                 gt.noise.isotropic(2, q_sigma)))
    vals = gt.Values.from_entries([(0, "Point2", np.asarray(state.mean)),
                                   (1, "Point2",
                                    np.asarray(state.mean) + np.asarray(u))])
    res = gt.gauss_newton(graph, vals, gt.OptimizerParams(max_iterations=2))
    marg = Marginals(graph, res.values)
    return GaussianState(jnp.asarray(res.values.at(1)),
                         jnp.asarray(marg.marginal_covariance(1)))


def update_by_elimination(state, z, r_sigma):
    """Measurement update as a single-variable graph: prior + measurement."""
    graph = gt.FactorGraph()
    graph.add(gt.prior_factors("Point2", [1], np.asarray(state.mean)[None],
                               gt.noise.covariance(
                                   np.asarray(state.cov)[None])))
    graph.add(gt.prior_factors("Point2", [1], np.asarray(z)[None],
                               gt.noise.isotropic(2, r_sigma)))
    vals = gt.Values.from_entries([(1, "Point2", np.asarray(z))])
    res = gt.gauss_newton(graph, vals, gt.OptimizerParams(max_iterations=2))
    marg = Marginals(graph, res.values)
    return GaussianState(jnp.asarray(res.values.at(1)),
                         jnp.asarray(marg.marginal_covariance(1)))


def main():
    u = np.array([1.0, 0.0])
    q_sigma, r_sigma = 0.1, 0.1

    # factor-graph path
    state = GaussianState(jnp.zeros(2), 0.01 * jnp.eye(2))
    # closed-form KF oracle
    kf = kf_init(jnp.zeros(2), 0.01 * jnp.eye(2))
    F = H = jnp.eye(2)
    Q = R = 0.01 * jnp.eye(2)

    for k in range(1, 4):
        state = predict_by_elimination(state, u, q_sigma)
        kf = kf_predict(kf, F, jnp.eye(2), jnp.asarray(u), Q)
        np.testing.assert_allclose(np.asarray(state.mean),
                                   np.asarray(kf.mean), atol=1e-8)
        np.testing.assert_allclose(np.asarray(state.cov),
                                   np.asarray(kf.cov), atol=1e-8)
        z = np.array([float(k), 0.0])
        state = update_by_elimination(state, z, r_sigma)
        kf = kf_update(kf, H, jnp.asarray(z), R)
        np.testing.assert_allclose(np.asarray(state.mean),
                                   np.asarray(kf.mean), atol=1e-8)
        print(f"x{k}: mean {np.round(np.asarray(state.mean), 4)}  "
              f"cov diag {np.round(np.diagonal(np.asarray(state.cov)), 5)}")

    assert np.allclose(np.asarray(state.mean), [3.0, 0.0], atol=1e-6)
    print("factor-graph elimination matches the closed-form Kalman filter")
    return state


if __name__ == "__main__":
    main()
