"""IncrementalSmoother (compile-free iSAM2 runtime): batch equivalence +
capacity-growth behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

import gtsam_tpu as gt
from gtsam_tpu.nonlinear.incremental import IncrementalSmoother

rng = np.random.default_rng(3)


class TestIncrementalSmoother:
    @pytest.mark.slow
    def test_matches_batch(self):
        sm = IncrementalSmoother(relinearize_threshold=0.0, relinearize_skip=1)
        prior = gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                                 gt.noise.sigmas([[0.01, 0.01, 0.01]]))
        sm.update([prior], [(0, "SE2", np.zeros(3))])
        batch_graph = gt.FactorGraph([prior])
        n = 14
        for i in range(1, n):
            meas = np.array([1.0, 0, 0]) + rng.normal(scale=0.05, size=3)
            b = gt.between_factors("SE2", [i - 1], [i], meas[None],
                                   gt.noise.sigmas([[0.05, 0.05, 0.02]]))
            guess = np.asarray(sm.estimate_of(i - 1)) + np.array([1.0, 0, 0])
            sm.update([b], [(i, "SE2", guess)])
            batch_graph.add(b)
            if i % 5 == 0:
                lc = gt.between_factors("SE2", [0], [i],
                                        np.array([[i * 1.0, 0.2, 0.1]]),
                                        gt.noise.sigmas([[0.1, 0.1, 0.05]]))
                sm.update([lc])
                batch_graph.add(lc)
        for _ in range(3):
            sm.update()  # extra relinearized solves to converge
        est = sm.calculate_estimate()
        res = gt.gauss_newton(batch_graph, est,
                              gt.OptimizerParams(max_iterations=20))
        e_inc = float(batch_graph.error(est))
        assert e_inc <= res.error * (1 + 1e-6) + 1e-9, (e_inc, res.error)

    def test_mixed_types(self):
        """Poses + landmarks merge into separate stores and solve together."""
        from gtsam_tpu.sam import factors as sam_factors
        sm = IncrementalSmoother(relinearize_threshold=0.0)
        sm.update([gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                                    gt.noise.sigmas([[0.01, 0.01, 0.01]]))],
                  [(0, "SE2", np.zeros(3))])
        L = gt.shorthand("l")
        lm = np.array([1.0, 1.0])
        sm.update(
            [sam_factors.bearing_range_2d_factors(
                [0], [L(0)], [np.arctan2(1, 1)], [np.sqrt(2.0)],
                gt.noise.sigmas([[0.01, 0.05]]))],
            [(L(0), "Point2", lm + rng.normal(scale=0.2, size=2))])
        for _ in range(4):
            sm.update()
        got = np.asarray(sm.estimate_of(L(0)))
        np.testing.assert_allclose(got, lm, atol=1e-3)

    @pytest.mark.slow

    def test_capacity_growth_consistency(self):
        """Growing past several capacity doublings keeps the solution exact."""
        sm = IncrementalSmoother(relinearize_threshold=0.0)
        sm.update([gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                                    gt.noise.sigmas([[0.01, 0.01, 0.01]]))],
                  [(0, "SE2", np.zeros(3))])
        for i in range(1, 40):
            b = gt.between_factors("SE2", [i - 1], [i],
                                   np.array([[1.0, 0, 0]]),
                                   gt.noise.sigmas([[0.05, 0.05, 0.02]]))
            sm.update([b], [(i, "SE2", np.array([i * 1.0, 0, 0]))])
        got = np.asarray(sm.estimate_of(39))
        np.testing.assert_allclose(got, [39.0, 0, 0], atol=1e-6)
        # compiles scale with capacity doublings, not updates
        assert len(sm._solve_cache) <= 8
