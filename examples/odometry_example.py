"""OdometryExample analog: the "hello world" factor graph — a prior on the
first pose and two odometry between-factors, solved with LM, then queried
for marginal covariances.

Reference: examples/OdometryExample.cpp (also the first example of the GTSAM
tutorial, doc/gtsam.lyx).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt


def main():
    graph = gt.FactorGraph()
    graph.add(gt.prior_factors("SE2", [1], np.array([[0.0, 0.0, 0.0]]),
                               gt.noise.sigmas([[0.3, 0.3, 0.1]])))
    graph.add(gt.between_factors("SE2", [1, 2], [2, 3],
                                 np.array([[2.0, 0.0, 0.0]] * 2),
                                 gt.noise.sigmas([[0.2, 0.2, 0.1]] * 2)))

    initial = gt.Values.from_entries([
        (1, "SE2", np.array([0.5, 0.0, 0.2])),
        (2, "SE2", np.array([2.3, 0.1, -0.2])),
        (3, "SE2", np.array([4.1, 0.1, 0.1])),
    ])
    res = gt.levenberg_marquardt(graph, initial)
    print(f"final error: {res.error:.6f}")
    for k in (1, 2, 3):
        print(f"  x{k}: {np.asarray(res.values.at(k)).round(4)}")

    marg = gt.Marginals(graph, res.values)
    for k in (1, 2, 3):
        cov = np.asarray(marg.marginal_covariance(k))
        print(f"  x{k} cov diag: {np.diagonal(cov).round(4)}")

    # optimum: poses at 0, 2, 4 along x — and covariance grows down the chain
    assert np.allclose(np.asarray(res.values.at(3)), [4.0, 0.0, 0.0], atol=1e-4)
    c1 = np.diagonal(np.asarray(marg.marginal_covariance(1)))
    c3 = np.diagonal(np.asarray(marg.marginal_covariance(3)))
    assert np.all(c3 >= c1 - 1e-9)
    return res


if __name__ == "__main__":
    main()
