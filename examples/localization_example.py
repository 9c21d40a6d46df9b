"""LocalizationExample analog: odometry chain + unary "GPS-like" custom
factors constraining each pose's translation.

Reference: examples/LocalizationExample.cpp (UnaryFactor with hand-written
Jacobian; here the custom residual gets its Jacobian from autodiff).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.graph import factors as factors_mod
from gtsam_tpu.geometry import se2


def gps_factors(keys, measurements, noise):
    """Unary factor on the SE2 translation (UnaryFactor analog)."""
    def fn(xs, m):
        return xs[0][:2] - m   # SE2 is (x, y, theta); constrain translation
    return factors_mod.custom_factors(
        "GPS", ("SE2",), np.asarray(keys)[:, None], fn, 2,
        np.asarray(measurements, dtype=float), noise)


def main():
    graph = gt.FactorGraph()
    odo_noise = gt.noise.sigmas([[0.2, 0.2, 0.1]] * 2)
    graph.add(gt.between_factors("SE2", [0, 1], [1, 2],
                                 np.array([[2.0, 0.0, 0.0]] * 2), odo_noise))
    gps_noise = gt.noise.sigmas([[0.1, 0.1]] * 3)
    graph.add(gps_factors([0, 1, 2],
                          [[0.0, 0.0], [2.0, 0.0], [4.0, 0.0]], gps_noise))

    initial = gt.Values.from_entries([
        (0, "SE2", np.array([0.5, 0.0, 0.2])),
        (1, "SE2", np.array([2.3, 0.1, -0.2])),
        (2, "SE2", np.array([4.1, 0.1, 0.1])),
    ])
    res = gt.levenberg_marquardt(graph, initial)
    print(f"final error: {res.error:.6f} ({res.iterations} iters)")
    for k in range(3):
        print(f"  x{k}: {np.asarray(res.values.at(k)).round(4)}")

    from gtsam_tpu.nonlinear.marginals import Marginals
    marg = Marginals(graph, res.values)
    for k in range(3):
        cov = np.asarray(marg.marginal_covariance(k))
        print(f"  x{k} cov diag: {np.diagonal(cov).round(5)}")
    return res


if __name__ == "__main__":
    main()
