"""Hybrid inference tests: discrete-continuous mixtures (slip/no-slip,
loop-closure hypothesis selection) — testHybridGaussianFactorGraph idioms."""

import numpy as np
import pytest

import gtsam_tpu as gt
from gtsam_tpu.discrete.discrete import DiscreteFactor
from gtsam_tpu.hybrid.hybrid import (
    HybridFactorGraph,
    mixture_between_factors,
)

import jax.numpy as jnp


class TestHybrid:
    def _slip_problem(self, true_mode=0):
        """1D-ish robot: odometry is either mode 0 (move 1.0) or mode 1 (slip 0.0)."""
        g = HybridFactorGraph()
        g.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[0.01, 0.01, 0.01]])))
        # strong GPS-like prior on pose 1 reveals the true mode
        x1 = np.array([[1.0, 0.0, 0.0]]) if true_mode == 0 else np.array([[0.02, 0.0, 0.0]])
        g.add(gt.prior_factors("SE2", [1], x1, gt.noise.sigmas([[0.05, 0.05, 0.05]])))
        m = mixture_between_factors(
            "SE2", discrete_key=100, keys1=[0], keys2=[1],
            measurements_per_component=[np.array([[1.0, 0, 0]]),
                                        np.array([[0.0, 0, 0]])],
            noises=[gt.noise.sigmas([[0.05, 0.05, 0.05]]),
                    gt.noise.sigmas([[0.05, 0.05, 0.05]])])
        g.add_mixture(m)
        init = gt.Values.from_entries([
            (0, "SE2", np.zeros(3)), (1, "SE2", np.array([0.5, 0, 0]))])
        return g, init

    @pytest.mark.slow

    def test_mode_selection(self):
        for true_mode in (0, 1):
            g, init = self._slip_problem(true_mode)
            sol = g.optimize(init)
            assert sol.discrete[100] == true_mode, true_mode

    @pytest.mark.slow
    def test_posterior_concentrates(self):
        g, init = self._slip_problem(0)
        assignments, probs = g.discrete_posterior(init)
        i0 = next(i for i, a in enumerate(assignments) if a[100] == 0)
        assert probs[i0] > 0.99

    @pytest.mark.slow
    def test_discrete_prior_influences(self):
        """With an overwhelming discrete prior on mode 1 and ambiguous data,
        the posterior follows the prior."""
        g = HybridFactorGraph()
        g.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[0.01, 0.01, 0.01]])))
        # weak pose-1 prior right between the two hypotheses
        g.add(gt.prior_factors("SE2", [1], np.array([[0.5, 0, 0]]),
                               gt.noise.sigmas([[5.0, 5.0, 5.0]])))
        m = mixture_between_factors(
            "SE2", 100, [0], [1],
            [np.array([[1.0, 0, 0]]), np.array([[0.0, 0, 0]])],
            [gt.noise.sigmas([[0.1, 0.1, 0.1]]),
             gt.noise.sigmas([[0.1, 0.1, 0.1]])])
        g.add_mixture(m)
        g.add_discrete(DiscreteFactor((100,), (2,), jnp.asarray([0.001, 0.999])))
        init = gt.Values.from_entries([
            (0, "SE2", np.zeros(3)), (1, "SE2", np.array([0.5, 0, 0]))])
        sol = g.optimize(init)
        assert sol.discrete[100] == 1

    def test_prune(self):
        g, init = self._slip_problem(0)
        kept, probs = g.prune(init, 1)
        assert len(kept) == 1 and kept[0][100] == 0
        np.testing.assert_allclose(probs, [1.0])
