"""QP/LP active-set solver and concurrent filter/smoother tests."""

import numpy as np
import pytest

import gtsam_tpu as gt
from gtsam_tpu.linear.qp import solve_lp, solve_qp
from gtsam_tpu.nonlinear.concurrent import (
    ConcurrentFilter, ConcurrentParams, ConcurrentSmoother)


class TestQP:
    def test_unconstrained(self):
        G = np.diag([2.0, 4.0])
        g = np.array([-2.0, -8.0])
        res = solve_qp(G, g)
        np.testing.assert_allclose(res.x, [1.0, 2.0], atol=1e-8)

    def test_equality_constrained(self):
        # min 0.5(x^2+y^2) s.t. x + y = 2  -> x = y = 1
        res = solve_qp(np.eye(2), np.zeros(2), A_eq=[[1.0, 1.0]], b_eq=[2.0])
        np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-8)

    def test_active_inequality(self):
        # min 0.5||x - (2,0)||^2 s.t. x1 <= 1  (i.e. -x1 >= -1)
        res = solve_qp(np.eye(2), np.array([-2.0, 0.0]),
                       A_in=[[-1.0, 0.0]], b_in=[-1.0])
        assert res.converged
        np.testing.assert_allclose(res.x, [1.0, 0.0], atol=1e-8)

    def test_inactive_inequality(self):
        res = solve_qp(np.eye(2), np.array([-0.5, 0.0]),
                       A_in=[[-1.0, 0.0]], b_in=[-1.0])
        np.testing.assert_allclose(res.x, [0.5, 0.0], atol=1e-8)
        assert res.active == []

    def test_lp_vertex(self):
        # min -x - y s.t. x >= 0, y >= 0, x + y <= 1 -> any point on the face
        # x + y = 1; regularized LP picks the analytic center of that face
        res = solve_lp([-1.0, -1.0],
                       A_in=[[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]],
                       b_in=[0.0, 0.0, -1.0])
        np.testing.assert_allclose(res.x[0] + res.x[1], 1.0, atol=1e-5)

    def test_qp_matches_projection(self):
        """Random SPD QP with box-ish constraints vs scipy reference."""
        rng = np.random.default_rng(0)
        n = 5
        A = rng.normal(size=(n, n))
        G = A @ A.T + n * np.eye(n)
        g = rng.normal(size=n)
        A_in = np.eye(n)
        b_in = np.zeros(n)  # x >= 0
        res = solve_qp(G, g, A_in=A_in, b_in=b_in)
        assert res.converged
        # KKT check: gradient orthogonal to feasible directions
        grad = G @ res.x + g
        for i in range(n):
            if res.x[i] > 1e-8:
                assert abs(grad[i]) < 1e-6
            else:
                assert grad[i] > -1e-6  # pushing into the constraint


class TestConcurrent:
    @pytest.mark.slow
    def test_filter_smoother_handoff(self):
        params = ConcurrentParams(filter_lag=2.5)
        filt = ConcurrentFilter(params)
        smoother = ConcurrentSmoother(params)
        filt.update(
            [gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                              gt.noise.sigmas([[0.01, 0.01, 0.01]]))],
            [(0, "SE2", np.zeros(3))], {0: 0.0})
        for i in range(1, 9):
            b = gt.between_factors("SE2", [i - 1], [i], np.array([[1.0, 0, 0]]),
                                   gt.noise.sigmas([[0.05, 0.05, 0.02]]))
            filt.update([b], [(i, "SE2", np.array([i * 1.0, 0, 0]))],
                        {i: float(i)})
            if i % 3 == 0:
                filt.synchronize(smoother)
                smoother.update()
        # filter only holds the recent window
        assert 0 not in filt.values
        assert 8 in filt.values
        est8 = np.asarray(filt.values.at(8))
        np.testing.assert_allclose(est8[0], 8.0, atol=1e-5)
        # smoother has the old states, consistent with ground truth
        assert 0 in smoother.values
        assert np.abs(np.asarray(smoother.values.at(2))[0] - 2.0) < 1e-4
