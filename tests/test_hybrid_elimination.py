"""Hybrid sequential elimination vs the enumeration oracle.

The enumeration implementation (hybrid.HybridFactorGraph.discrete_posterior)
computes the exact discrete posterior by brute force; eliminate_sequential
must reproduce it (reference oracle: testHybridGaussianFactorGraph.cpp
ratio/posterior checks), and the conditional back-substitution must equal the
per-assignment Gaussian solve."""

import jax.numpy as jnp
import numpy as np
import pytest

import gtsam_tpu as gt
from gtsam_tpu.hybrid import elimination as he
from gtsam_tpu.hybrid.hybrid import HybridFactorGraph, MixtureFactorBatch
from gtsam_tpu.discrete.discrete import DiscreteFactor


def _tiny_switching_graph():
    """1D chain x0—x1—x2 with a 2-mode between on each edge (slip/no-slip)."""
    hfg = HybridFactorGraph()
    hfg.add(gt.prior_factors("Vec1", [0], np.asarray([[0.0]]),
                             gt.noise.isotropic(1, 0.5)))
    # edge measurements: mode 0 = move 1.0 (tight), mode 1 = stay (loose)
    for i, z in enumerate([1.05, 0.98]):
        comps = [
            gt.between_factors("Vec1", [i], [i + 1], np.asarray([[z]]),
                               gt.noise.isotropic(1, 0.1)),
            gt.between_factors("Vec1", [i], [i + 1], np.asarray([[0.0]]),
                               gt.noise.isotropic(1, 2.0)),
        ]
        hfg.add_mixture(MixtureFactorBatch(100 + i, 2, comps))
    # weak position measurements so every assignment is identifiable
    hfg.add(gt.prior_factors("Vec1", [1, 2], np.asarray([[1.0], [2.0]]),
                             gt.noise.isotropic(1, 1.0)))
    # mode prior favoring no-slip slightly
    hfg.add_discrete(DiscreteFactor((100,), (2,), jnp.asarray([0.6, 0.4])))
    hfg.add_discrete(DiscreteFactor((101,), (2,), jnp.asarray([0.6, 0.4])))
    values = gt.Values.from_entries(
        [(i, "Vec1", jnp.zeros(1)) for i in range(3)])
    return hfg, values


class TestHybridElimination:
    @pytest.mark.slow
    def test_posterior_matches_enumeration(self):
        hfg, values = _tiny_switching_graph()
        factors = he.linearize_hybrid(hfg, values)
        bn = he.eliminate_sequential(factors, [0, 1, 2], hfg.discrete)
        assigns, probs = bn.discrete_posterior()

        # oracle: brute-force per-assignment Gaussian evidence (linear graph,
        # so LM converges in one step from the linearization point)
        o_assigns, o_probs = hfg.discrete_posterior(
            values, gt.LMParams(max_iterations=50))
        lut = {tuple(sorted(a.items())): p for a, p in zip(o_assigns, o_probs)}
        for a, p in zip(assigns, probs):
            po = lut[tuple(sorted(a.items()))]
            np.testing.assert_allclose(p, po, atol=1e-6)

    def test_mpe_and_continuous_solution(self):
        hfg, values = _tiny_switching_graph()
        assignment, sol = he.solve_hybrid(hfg, values)
        # MPE should be no-slip on both edges given the data
        assert assignment[100] == 0 and assignment[101] == 0
        # continuous part == plain Gaussian solve of the selected graph
        g = hfg.graph_for(assignment)
        res = gt.gauss_newton(g, values, gt.OptimizerParams(max_iterations=20))
        for k in range(3):
            np.testing.assert_allclose(
                float(values.at(k)[0] + sol[k][0]),
                float(res.values.at(k)[0]), atol=1e-8)

    def test_elimination_order_invariance(self):
        hfg, values = _tiny_switching_graph()
        factors = he.linearize_hybrid(hfg, values)
        bn1 = he.eliminate_sequential(factors, [0, 1, 2], hfg.discrete)
        factors2 = he.linearize_hybrid(hfg, values)
        bn2 = he.eliminate_sequential(factors2, [2, 0, 1], hfg.discrete)
        a1, p1 = bn1.discrete_posterior()
        a2, p2 = bn2.discrete_posterior()
        lut = {tuple(sorted(a.items())): p for a, p in zip(a2, p2)}
        for a, p in zip(a1, p1):
            np.testing.assert_allclose(p, lut[tuple(sorted(a.items()))],
                                       atol=1e-8)

    def test_local_separator_only(self):
        """Discrete separators stay LOCAL: modes of one connected component
        never appear in another component's conditionals (the reference's
        per-assignment DecisionTree has the same locality)."""
        hfg = HybridFactorGraph()
        for base, mode in ((0, 100), (10, 101)):
            hfg.add(gt.prior_factors("Vec1", [base], np.asarray([[0.0]]),
                                     gt.noise.isotropic(1, 0.1)))
            comps = [
                gt.between_factors("Vec1", [base], [base + 1],
                                   np.asarray([[1.0]]),
                                   gt.noise.isotropic(1, 0.1)),
                gt.between_factors("Vec1", [base], [base + 1],
                                   np.asarray([[-1.0]]),
                                   gt.noise.isotropic(1, 0.1)),
            ]
            hfg.add_mixture(MixtureFactorBatch(mode, 2, comps))
            hfg.add(gt.prior_factors("Vec1", [base + 1], np.asarray([[1.0]]),
                                     gt.noise.isotropic(1, 0.3)))
        values = gt.Values.from_entries(
            [(k, "Vec1", jnp.zeros(1)) for k in (0, 1, 10, 11)])
        factors = he.linearize_hybrid(hfg, values)
        bn = he.eliminate_sequential(factors, [0, 1, 10, 11])
        for cond in bn.conditionals:
            assert cond.R.shape[0] <= 2       # one local mode at most
            assert len(cond.dkeys) <= 1
        assignment, sol = bn.optimize()
        assert assignment[100] == 0 and assignment[101] == 0

    @pytest.mark.slow

    def test_mode_chain_mpe(self):
        """A 10-edge mode chain (2^10 joint assignments at the root) still
        yields the right MPE — the vmapped-QR axis simply widens."""
        n = 10
        hfg = HybridFactorGraph()
        hfg.add(gt.prior_factors("Vec1", [0], np.asarray([[0.0]]),
                                 gt.noise.isotropic(1, 0.1)))
        for i in range(n):
            comps = [
                gt.between_factors("Vec1", [i], [i + 1], np.asarray([[1.0]]),
                                   gt.noise.isotropic(1, 0.1)),
                gt.between_factors("Vec1", [i], [i + 1], np.asarray([[-1.0]]),
                                   gt.noise.isotropic(1, 0.1)),
            ]
            hfg.add_mixture(MixtureFactorBatch(100 + i, 2, comps))
        hfg.add(gt.prior_factors("Vec1", [n], np.asarray([[float(n)]]),
                                 gt.noise.isotropic(1, 0.3)))
        values = gt.Values.from_entries(
            [(i, "Vec1", jnp.zeros(1)) for i in range(n + 1)])
        factors = he.linearize_hybrid(hfg, values)
        bn = he.eliminate_sequential(factors, list(range(n + 1)))
        assignment, sol = bn.optimize()
        assert all(assignment[100 + i] == 0 for i in range(n))
        np.testing.assert_allclose(float(sol[n][0]), float(n), atol=0.2)


class TestHybridSmoother:
    @pytest.mark.slow
    def test_incremental_with_pruning(self):
        """Incremental updates keep the joint mode table bounded and pick the
        right modes (HybridSmoother analog)."""
        sm = he.HybridSmoother(max_assignments=4)
        n = 6
        values = gt.Values.from_entries(
            [(i, "Vec1", jnp.zeros(1)) for i in range(n + 1)])
        base = HybridFactorGraph()
        base.add(gt.prior_factors("Vec1", [0], np.asarray([[0.0]]),
                                  gt.noise.isotropic(1, 0.1)))
        bn = sm.update(base, values)
        for i in range(n):
            step = HybridFactorGraph()
            comps = [
                gt.between_factors("Vec1", [i], [i + 1], np.asarray([[1.0]]),
                                   gt.noise.isotropic(1, 0.1)),
                gt.between_factors("Vec1", [i], [i + 1], np.asarray([[-1.0]]),
                                   gt.noise.isotropic(1, 0.1)),
            ]
            step.add_mixture(MixtureFactorBatch(100 + i, 2, comps))
            step.add(gt.prior_factors("Vec1", [i + 1],
                                      np.asarray([[float(i + 1)]]),
                                      gt.noise.isotropic(1, 0.3)))
            bn = sm.update(step, values)
        assignment, sol = bn.optimize()
        assert all(assignment[100 + i] == 0 for i in range(n))
        # pruned: at most 4 nonzero leaves in the joint table
        prod = bn.discrete.product()
        assert int(np.count_nonzero(np.asarray(prod.table))) <= 4
