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


import numpy as np


def test_qmatrix_both_triangles_not_double_counted(tmp_path):
    """QMATRIX lists BOTH triangles; entries must be assigned one-sided
    (round-5 advisor fix) — mirroring QUADOBJ's lower-triangle convention
    would double every cross term."""
    txt = """NAME          T1
ROWS
 N  obj
 G  c1
COLUMNS
    x1  obj  1.0  c1  1.0
    x2  obj  1.0  c1  1.0
RHS
    rhs  c1  1.0
QMATRIX
    x1  x1  2.0
    x1  x2  1.0
    x2  x1  1.0
    x2  x2  2.0
BOUNDS
 FR bnd x1
 FR bnd x2
ENDATA
"""
    p = tmp_path / "t1.qps"
    p.write_text(txt)
    from gtsam_tpu.linear.qps import parse_qps
    prob = parse_qps(str(p))
    np.testing.assert_allclose(prob.Q, [[2.0, 1.0], [1.0, 2.0]])


def test_ranges_on_equality_row(tmp_path):
    """A RANGES entry on an E row makes it two-sided b <= ax <= b+r
    (round-5 advisor fix; previously parsed as an over-constrained
    equality)."""
    txt = """NAME          T2
ROWS
 N  obj
 E  e1
COLUMNS
    x1  obj  1.0  e1  1.0
RHS
    rhs  e1  2.0
RANGES
    rng  e1  3.0
ENDATA
"""
    p = tmp_path / "t2.qps"
    p.write_text(txt)
    from gtsam_tpu.linear.qps import parse_qps
    prob = parse_qps(str(p))
    assert len(prob.A_eq) == 0
    # two inequality rows from the range plus the default x1 >= 0 bound
    assert len(prob.A_in) == 3
    # min x1 s.t. 2 <= x1 <= 5 -> 2 (objective c = [1])
    from gtsam_tpu.linear.qps import solve_qps
    _, res, obj = solve_qps(str(p))
    assert res.converged and abs(obj - 2.0) < 1e-6
