"""Discrete inference tests, mirroring reference idioms (testDiscreteFactorGraph,
the Asia network example in discrete examples)."""

import numpy as np

import jax.numpy as jnp

from gtsam_tpu.discrete.discrete import (
    DiscreteBayesNet,
    DiscreteFactor,
    DiscreteFactorGraph,
    from_signature,
    product,
)


class TestProductEliminate:
    def test_product(self):
        f1 = DiscreteFactor((0,), (2,), jnp.asarray([0.4, 0.6]))
        f2 = DiscreteFactor((0, 1), (2, 2), jnp.asarray([[0.9, 0.1], [0.2, 0.8]]))
        p = product([f1, f2])
        assert p.keys == (0, 1)
        np.testing.assert_allclose(np.asarray(p.table),
                                   [[0.36, 0.04], [0.12, 0.48]], atol=1e-12)

    def test_marginals_chain(self):
        # X0 - X1 chain: P(X0), P(X1|X0); check P(X1)
        g = DiscreteFactorGraph()
        g.add([0], [2], [0.3, 0.7])
        g.add([1, 0], [2, 2], np.array([[0.9, 0.4], [0.1, 0.6]]))  # P(x1|x0)
        m1 = np.asarray(g.marginals(1))
        expected = [0.3 * 0.9 + 0.7 * 0.4, 0.3 * 0.1 + 0.7 * 0.6]
        np.testing.assert_allclose(m1, expected, atol=1e-12)

    def test_mpe_simple(self):
        g = DiscreteFactorGraph()
        g.add([0], [2], [0.3, 0.7])
        g.add([1, 0], [2, 2], np.array([[0.9, 0.4], [0.1, 0.6]]))
        mpe = g.optimize()
        # brute force
        best, bp = None, -1
        for a in range(2):
            for b in range(2):
                p = [0.3, 0.7][a] * np.array([[0.9, 0.4], [0.1, 0.6]])[b, a]
                if p > bp:
                    best, bp = {0: a, 1: b}, p
        assert mpe == best

    def test_mpe_loopy(self):
        rng = np.random.default_rng(0)
        g = DiscreteFactorGraph()
        cards = [2, 3, 2, 3]
        for k, c in enumerate(cards):
            g.add([k], [c], rng.uniform(0.1, 1.0, size=c))
        for (i, j) in [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]:
            g.add([i, j], [cards[i], cards[j]],
                  rng.uniform(0.1, 1.0, size=(cards[i], cards[j])))
        mpe = g.optimize()
        # brute force over 36 assignments
        joint = g.product()
        best, bp = None, -1.0
        import itertools
        for assign in itertools.product(*[range(c) for c in cards]):
            a = dict(enumerate(assign))
            v = joint.value(a)
            if v > bp:
                best, bp = a, v
        assert mpe == best
        np.testing.assert_allclose(joint.value(mpe), bp)

    def test_eliminate_sequential_joint(self):
        rng = np.random.default_rng(1)
        g = DiscreteFactorGraph()
        g.add([0], [2], rng.uniform(0.1, 1, 2))
        g.add([0, 1], [2, 3], rng.uniform(0.1, 1, (2, 3)))
        g.add([1, 2], [3, 2], rng.uniform(0.1, 1, (3, 2)))
        bn = g.eliminate_sequential([0, 1, 2])
        joint = g.product().normalized()
        # bayes net product == normalized joint
        import itertools
        for assign in itertools.product(range(2), range(3), range(2)):
            a = dict(enumerate(assign))
            np.testing.assert_allclose(bn.evaluate(a), joint.value(a), atol=1e-12)


class TestSignature:
    def test_prior(self):
        keys = {"A": (0, 2)}
        c = from_signature("A = 1/3", keys)
        np.testing.assert_allclose(np.asarray(c.table), [0.25, 0.75])

    def test_conditional(self):
        keys = {"A": (0, 2), "B": (1, 2)}
        c = from_signature("A | B = 1/3 3/1", keys)
        assert c.frontals == (0,) and c.parents == (1,)
        np.testing.assert_allclose(np.asarray(c.table),
                                   [[0.25, 0.75], [0.75, 0.25]])

    def test_asia_fragment(self):
        """Asia-network style fragment: smoking -> cancer, MPE + marginal."""
        keys = {"S": (0, 2), "C": (1, 2)}
        prior = from_signature("S = 1/1", keys)
        cond = from_signature("C | S = 99/1 90/10", keys)
        g = DiscreteBayesNet([cond, prior]).to_graph()
        m = np.asarray(g.marginals(1))
        np.testing.assert_allclose(m, [0.5 * 0.99 + 0.5 * 0.9,
                                       0.5 * 0.01 + 0.5 * 0.1], atol=1e-12)

    def test_sampling(self):
        keys = {"A": (0, 2), "B": (1, 2)}
        prior = from_signature("B = 1/1", keys)
        cond = from_signature("A | B = 9/1 1/9", keys)
        bn = DiscreteBayesNet([cond, prior])
        rng = np.random.default_rng(0)
        counts = np.zeros(2)
        for _ in range(2000):
            s = bn.sample(rng)
            counts[s[0]] += 1
        np.testing.assert_allclose(counts / 2000, [0.5, 0.5], atol=0.05)
