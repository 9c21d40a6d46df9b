"""QPS parser + active-set QP on the reference's shipped QPS problems.

Expected objective values are the reference's own test expectations
(gtsam_unstable/linear/tests/testQPSolver.cpp:259-312, QPSParser.h).
"""

import os

import pytest

from gtsam_tpu.io import datasets
from gtsam_tpu.linear.qps import parse_qps, solve_qps

EXPECTED = {
    "QPTEST.QPS": (4.371875, 1e-7),
    "HS21.QPS": (-99.9599999, 1e-6),
    "HS35.QPS": (1.11111111e-01, 1e-7),
    "HS35MOD.QPS": (2.50000001e-01, 1e-7),
    "HS51.QPS": (0.0, 1e-7),
    "HS52.QPS": (5.32664756, 1e-7),
    "HS268.QPS": (0.0, 1e-6),
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_qps_reference_optimum(name):
    expected, tol = EXPECTED[name]
    path = datasets.find_example_data(name)
    prob, res, obj = solve_qps(path, max_iterations=300)
    assert res.converged
    assert abs(obj - expected) < tol


def test_qps_parse_structure():
    p = parse_qps(datasets.find_example_data("QPTEST.QPS"))
    assert p.names == ["c1", "c2"]
    assert p.Q[0, 0] == 8.0 and p.Q[0, 1] == 2.0 and p.Q[1, 1] == 10.0
    assert p.c[0] == 1.5 and p.c[1] == -2.0
    # r1 (G), r2 (L -> negated), LO defaults on both vars, UP on c1
    assert p.A_in.shape[0] == 2 + 2 + 1
