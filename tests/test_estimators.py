"""GNC, Kalman filter/EKF, fixed-lag smoother, basis-module tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import gtsam_tpu as gt
from gtsam_tpu.basis import chebyshev as cheb
from gtsam_tpu.linear.kalman import (
    ExtendedKalmanFilter, GaussianState, kf_init, kf_predict, kf_update)
from gtsam_tpu.nonlinear.fixed_lag import BatchFixedLagSmoother, FixedLagParams, marginalize
from gtsam_tpu.optimize.gnc import GncParams, gnc_optimize

rng = np.random.default_rng(8)


class TestGNC:
    @pytest.mark.slow
    def test_rejects_outlier_loop_closure(self):
        """Pose chain with one gross outlier closure: GNC downweights it."""
        n = 8
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[0.01, 0.01, 0.01]])))
        meas = np.tile([1.0, 0.0, 0.0], (n - 1, 1))
        g.add(gt.between_factors("SE2", np.arange(n - 1), np.arange(1, n), meas,
                                 gt.noise.sigmas([[0.05, 0.05, 0.02]] * (n - 1))))
        # inlier closure 0->4 plus a gross outlier 0->7
        g.add(gt.between_factors("SE2", [0], [4], np.array([[4.0, 0, 0]]),
                                 gt.noise.sigmas([[0.05, 0.05, 0.02]])))
        g.add(gt.between_factors("SE2", [0], [7], np.array([[2.0, 5.0, 1.5]]),
                                 gt.noise.sigmas([[0.05, 0.05, 0.02]])))
        init = gt.Values.from_entries(
            [(i, "SE2", np.array([i * 1.0, 0, 0]) + rng.normal(scale=0.05, size=3))
             for i in range(n)])
        res = gnc_optimize(g, init, GncParams(robust_batches=[2, 3]))
        tag, weights = res.history[-1]
        assert tag == "gnc_weights"
        assert weights[0][0] > 0.9     # inlier closure kept
        assert weights[1][0] < 0.1     # outlier rejected
        got = np.asarray(res.values.at(7))
        np.testing.assert_allclose(got[0], 7.0, atol=0.1)

    @pytest.mark.slow

    def test_gm_variant(self):
        g = gt.FactorGraph()
        g.add(gt.prior_factors("Point2", [0], np.zeros((1, 2)),
                               gt.noise.isotropic(2, 0.1)))
        # 10 inlier priors at (1,0), 3 outliers at (10,10)
        targets = np.vstack([np.tile([1.0, 0.0], (10, 1)) + rng.normal(scale=0.05, size=(10, 2)),
                             np.tile([10.0, 10.0], (3, 1))])
        g.add(gt.prior_factors("Point2", [1] * 13, targets, gt.noise.isotropic(2, 0.1)))
        init = gt.Values.from_entries([(0, "Point2", np.zeros(2)),
                                       (1, "Point2", np.array([3.0, 3.0]))])
        res = gnc_optimize(g, init, GncParams(loss_type="GM", robust_batches=[1]))
        got = np.asarray(res.values.at(1))
        np.testing.assert_allclose(got, [1.0, 0.0], atol=0.2)


class TestKalman:
    def test_linear_kf_converges(self):
        """Constant-position 1D model with noisy measurements."""
        F = jnp.eye(1)
        H = jnp.eye(1)
        Q = 1e-6 * jnp.eye(1)
        R = 0.25 * jnp.eye(1)
        s = kf_init(jnp.zeros(1), 10.0 * jnp.eye(1))
        truth = 3.0
        zs = truth + rng.normal(scale=0.5, size=200)
        for z in zs:
            s = kf_predict(s, F, None, None, Q)
            s = kf_update(s, H, jnp.asarray([z]), R)
        assert abs(float(s.mean[0]) - truth) < 0.15
        assert float(s.cov[0, 0]) < 0.01

    def test_ekf_range_bearing(self):
        """2D point tracked from range measurements to two beacons."""
        ekf = ExtendedKalmanFilter(
            retract=lambda x, d: x + d, local=lambda x, y: y - x, dim=2)
        beacons = np.array([[0.0, 0.0], [4.0, 0.0]])
        truth = np.array([1.0, 2.0])
        x = jnp.asarray([0.5, 0.5])
        st = GaussianState(jnp.zeros(2), 4.0 * jnp.eye(2))
        for _ in range(30):
            for bpos in beacons:
                z = np.linalg.norm(truth - bpos) + rng.normal(scale=0.01)
                x, st = ekf.update(
                    st, x,
                    lambda p, bp=jnp.asarray(bpos): jnp.linalg.norm(p - bp)[None],
                    jnp.asarray([z]), 1e-4 * jnp.eye(1))
        np.testing.assert_allclose(np.asarray(x), truth, atol=0.05)


class TestFixedLag:
    @pytest.mark.slow
    def test_marginalize_preserves_posterior(self):
        """Marginalizing a middle variable must keep the remaining optimum."""
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[0.01, 0.01, 0.01]])))
        g.add(gt.between_factors("SE2", [0, 1], [1, 2],
                                 np.tile([1.0, 0, 0], (2, 1)),
                                 gt.noise.sigmas([[0.1, 0.1, 0.05]] * 2)))
        init = gt.Values.from_entries(
            [(i, "SE2", np.array([i * 1.0, 0, 0])) for i in range(3)])
        full = gt.levenberg_marquardt(g, init)
        g2 = marginalize(g, full.values, [0])
        # re-optimize remaining keys from perturbed start
        init2_entries = []
        for k in [1, 2]:
            init2_entries.append((k, "SE2",
                                  np.asarray(full.values.at(k)) + [0.05, -0.05, 0.02]))
        init2 = gt.Values.from_entries(init2_entries)
        res2 = gt.levenberg_marquardt(g2, init2)
        for k in [1, 2]:
            np.testing.assert_allclose(np.asarray(res2.values.at(k)),
                                       np.asarray(full.values.at(k)), atol=1e-6)

    @pytest.mark.slow

    def test_fixed_lag_smoother_window(self):
        sm = BatchFixedLagSmoother(FixedLagParams(lag=2.5))
        sm.update([gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                                    gt.noise.sigmas([[0.01, 0.01, 0.01]]))],
                  [(0, "SE2", np.zeros(3))], {0: 0.0})
        for i in range(1, 8):
            b = gt.between_factors("SE2", [i - 1], [i],
                                   np.array([[1.0, 0, 0]]),
                                   gt.noise.sigmas([[0.05, 0.05, 0.02]]))
            sm.update([b], [(i, "SE2", np.array([i * 1.0, 0, 0]))], {i: float(i)})
        est = sm.calculate_estimate()
        assert 0 not in est and 3 not in est  # marginalized out
        assert 7 in est and 5 in est
        np.testing.assert_allclose(np.asarray(est.at(7))[0], 7.0, atol=1e-6)


class TestBasis:
    def test_chebyshev_interpolation(self):
        N = 16
        f = lambda x: np.sin(3 * x) + 0.5 * x
        xs = np.linspace(-1, 1, 60)  # cover endpoints: nodal values well-posed
        coeffs = cheb.fit_basis(xs, f(xs), N)
        for x in [-0.7, 0.0, 0.9]:
            w = cheb.chebyshev2_weights(N, -1, 1, x)
            assert abs(w @ coeffs - f(x)) < 1e-6

    def test_chebyshev1_fit_and_derivative(self):
        # T_k values and derivative identity T_k' = k U_{k-1}
        N = 10
        f = lambda x: np.cos(2.5 * x)
        df = lambda x: -2.5 * np.sin(2.5 * x)
        xs = np.linspace(-1, 1, 50)
        coeffs = cheb.fit_basis(xs, f(xs), N, kind="chebyshev1")
        for x in [-0.6, 0.1, 0.8]:
            W = cheb.chebyshev1_basis(N, x)
            D = cheb.chebyshev1_derivative_weights(N, x)
            assert abs(W[0] @ coeffs - f(x)) < 1e-5
            assert abs(D[0] @ coeffs - df(x)) < 1e-3

    def test_chebyshev1_known_values(self):
        # T_3(x) = 4x^3 - 3x at x = 0.5 -> -1.0
        W = cheb.chebyshev1_basis(4, 0.5)
        np.testing.assert_allclose(W[0], [1.0, 0.5, -0.5, -1.0], atol=1e-12)
        # U_3(x) = 8x^3 - 4x at x = 0.5 -> -1.0
        U = cheb.chebyshev2_basis(4, 0.5)
        np.testing.assert_allclose(U[0], [1.0, 1.0, 0.0, -1.0], atol=1e-12)

    def test_differentiation_matrix(self):
        N = 20
        pts = cheb.chebyshev2_points(N)
        D = cheb.chebyshev2_differentiation_matrix(N)
        f = np.sin(2 * pts)
        df = D @ f
        np.testing.assert_allclose(df, 2 * np.cos(2 * pts), atol=1e-8)

    def test_evaluation_factor_fit(self):
        """Fit coefficients through the factor-graph machinery."""
        N = 8
        f = lambda x: x ** 3 - x
        xs = np.linspace(-1, 1, 30)
        batch = cheb.evaluation_factors(0, xs, f(xs), N, -1.0, 1.0,
                                        gt.noise.isotropic(1, 0.01))
        g = gt.FactorGraph([batch])
        init = gt.Values.from_entries([(0, f"Vec{N}", np.zeros(N))])
        res = gt.gauss_newton(g, init)
        c = np.asarray(res.values.at(0))
        w = cheb.chebyshev2_weights(N, -1, 1, 0.5)
        assert abs(w @ c - f(0.5)) < 1e-6


class TestIncrementalFixedLag:
    @pytest.mark.slow
    def test_window_and_equivalence(self):
        """IncrementalFixedLagSmoother keeps the lag window, marginalizes the
        rest, and matches the batch smoother estimate on a chain
        (gtsam_unstable/nonlinear/IncrementalFixedLagSmoother.h analog)."""
        from gtsam_tpu.nonlinear.fixed_lag import IncrementalFixedLagSmoother
        inc = IncrementalFixedLagSmoother(FixedLagParams(lag=2.5))
        bat = BatchFixedLagSmoother(FixedLagParams(lag=2.5))
        for sm in (inc, bat):
            sm.update([gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                                        gt.noise.sigmas([[0.01, 0.01, 0.01]]))],
                      [(0, "SE2", np.zeros(3))], {0: 0.0})
        for i in range(1, 8):
            b = gt.between_factors("SE2", [i - 1], [i],
                                   np.array([[1.0, 0, 0]]),
                                   gt.noise.sigmas([[0.05, 0.05, 0.02]]))
            for sm in (inc, bat):
                sm.update([b], [(i, "SE2", np.array([i * 1.0, 0, 0]))],
                          {i: float(i)})
        ei, eb = inc.calculate_estimate(), bat.calculate_estimate()
        assert 0 not in ei and 3 not in ei
        assert 7 in ei and 5 in ei
        for k in (5, 6, 7):
            np.testing.assert_allclose(np.asarray(ei.at(k)),
                                       np.asarray(eb.at(k)), atol=1e-5)
