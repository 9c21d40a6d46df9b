"""Sparse TableFactor machinery vs dense discrete tables.

Mirrors the reference's testTableFactor.cpp / testDecisionTreeFactor.cpp
coverage: dense<->sparse parity on products/marginals/elimination, plus the
scalability case the dense path cannot do (a 25-variable chain: 2^25 dense
entries vs a few hundred sparse ones after pruning).
"""

import numpy as np
import pytest

from gtsam_tpu.discrete.discrete import DiscreteFactorGraph
from gtsam_tpu.discrete.table import (
    SparseDiscreteFactorGraph, TableFactor, table_marginalize, table_product)


def dense_rand(rng, keys, cards):
    t = rng.random(tuple(cards))
    return TableFactor.from_dense(keys, cards, t), t


def test_product_parity():
    rng = np.random.default_rng(0)
    f, tf = dense_rand(rng, (0, 1), (2, 3))
    g, tg = dense_rand(rng, (1, 2), (3, 4))
    p = table_product(f, g)
    expect = tf[:, :, None] * tg[None, :, :]
    assert p.keys == (0, 1, 2)
    np.testing.assert_allclose(p.dense(), expect, rtol=1e-12)


def test_product_sparse_join():
    # zero entries must drop out of the product support
    f = TableFactor.from_entries((0, 1), (2, 2), [[0, 0], [1, 1]], [2.0, 3.0])
    g = TableFactor.from_entries((1, 2), (2, 2), [[1, 0], [0, 1]], [5.0, 7.0])
    p = table_product(f, g)
    # matches: f(·,1)*g(1,·) -> (1,1,0) = 15 ; f(·,0)*g(0,·) -> (0,0,1) = 14
    assert p.size == 2
    assert p.value({0: 1, 1: 1, 2: 0}) == pytest.approx(15.0)
    assert p.value({0: 0, 1: 0, 2: 1}) == pytest.approx(14.0)


def test_marginalize_parity():
    rng = np.random.default_rng(1)
    f, tf = dense_rand(rng, (3, 5, 9), (2, 3, 2))
    m, _ = table_marginalize(f, 5, "sum")
    np.testing.assert_allclose(m.dense(), tf.sum(axis=1), rtol=1e-12)
    mx, arg = table_marginalize(f, 5, "max")
    np.testing.assert_allclose(mx.dense(), tf.max(axis=1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(arg.dense(), dtype=int),
                               tf.argmax(axis=1))


def test_mpe_parity_vs_dense():
    rng = np.random.default_rng(2)
    dense_g = DiscreteFactorGraph()
    sparse_g = SparseDiscreteFactorGraph()
    for (keys, cards) in [((0, 1), (2, 3)), ((1, 2), (3, 2)),
                          ((2, 3), (2, 2)), ((0, 3), (2, 2))]:
        t = rng.random(cards)
        dense_g.add(keys, cards, t)
        sparse_g.add(keys, cards, t)
    a_dense = dense_g.optimize()
    a_sparse = sparse_g.optimize()
    # compare joint probabilities (ties may differ)
    def joint(g, a):
        p = 1.0
        for f in g.factors:
            p *= f.value(a)
        return p
    assert joint(sparse_g, a_sparse) == pytest.approx(
        joint(sparse_g, a_dense), rel=1e-9)


def test_marginal_parity_vs_dense():
    rng = np.random.default_rng(3)
    dense_g = DiscreteFactorGraph()
    sparse_g = SparseDiscreteFactorGraph()
    for (keys, cards) in [((0, 1), (2, 2)), ((1, 2), (2, 3))]:
        t = rng.random(cards)
        dense_g.add(keys, cards, t)
        sparse_g.add(keys, cards, t)
    np.testing.assert_allclose(sparse_g.marginal(1),
                               np.asarray(dense_g.marginals(1)), rtol=1e-9)


def test_chain_25_variables():
    """2^25 dense entries would be 256 MB; sparse chain runs in ms."""
    rng = np.random.default_rng(4)
    g = SparseDiscreteFactorGraph()
    n = 25
    for i in range(n - 1):
        g.add((i, i + 1), (2, 2), rng.random((2, 2)))
    mpe = g.optimize()
    assert len(mpe) == n
    marg = g.marginal(12)
    assert marg.shape == (2,) and marg.sum() == pytest.approx(1.0)
    conds = g.eliminate_sequential()
    assert len(conds) == n


def test_pruned_wide_factor():
    """A 20-variable factor with 50 surviving assignments stays size-50."""
    rng = np.random.default_rng(5)
    n = 20
    keys = tuple(range(n))
    cards = (2,) * n
    assignments = rng.integers(0, 2, size=(50, n))
    f = TableFactor.from_entries(keys, cards, assignments, rng.random(50))
    assert f.size <= 50
    m, _ = table_marginalize(f, 7, "sum")
    assert m.size <= 50
    pruned = f.prune(max_entries=10)
    assert pruned.size == 10


def test_elimination_conditional_normalized():
    rng = np.random.default_rng(6)
    g = SparseDiscreteFactorGraph()
    g.add((0, 1), (2, 2), rng.random((2, 2)))
    conds = g.eliminate_sequential(ordering=[0, 1])
    c0 = conds[0]
    # P(0 | 1) sums to 1 over frontal for each parent assignment
    tab = c0.table.dense()          # (frontal, parent)
    np.testing.assert_allclose(tab.sum(axis=0), 1.0, rtol=1e-9)
