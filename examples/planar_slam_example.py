"""PlanarSLAMExample analog: SE2 poses + 2D landmarks with odometry and
bearing-range measurements, solved with Levenberg-Marquardt.

Reference: examples/PlanarSLAMExample.cpp (three poses, two landmarks,
bearing-range factors), examples/PlanarSLAMExample_sampling.cpp.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.sam.factors import bearing_range_2d_factors
from gtsam_tpu.base.keys import symbol


def main():
    # keys: x1..x3 poses, l1..l2 landmarks (reference symbol shorthand)
    x1, x2, x3 = symbol("x", 1), symbol("x", 2), symbol("x", 3)
    l1, l2 = symbol("l", 1), symbol("l", 2)

    graph = gt.FactorGraph()
    prior_noise = gt.noise.sigmas([[0.3, 0.3, 0.1]])
    graph.add(gt.prior_factors("SE2", [x1], np.array([[0.0, 0.0, 0.0]]),
                               prior_noise))
    odo_noise = gt.noise.sigmas([[0.2, 0.2, 0.1]] * 2)
    graph.add(gt.between_factors("SE2", [x1, x2], [x2, x3],
                                 np.array([[2.0, 0.0, 0.0]] * 2), odo_noise))
    br_noise = gt.noise.sigmas([[0.1, 0.2]] * 3)
    graph.add(bearing_range_2d_factors(
        [x1, x2, x3], [l1, l1, l2],
        bearings=np.array([np.pi / 4, np.pi / 2, np.pi / 2]),
        ranges=np.array([np.sqrt(8.0), 2.0, 2.0]), noise=br_noise))

    initial = gt.Values.from_entries([
        (x1, "SE2", np.array([-0.25, 0.20, 0.15])),
        (x2, "SE2", np.array([2.30, 0.10, -0.20])),
        (x3, "SE2", np.array([4.10, 0.10, 0.10])),
        (l1, "Point2", np.array([1.80, 2.10])),
        (l2, "Point2", np.array([4.10, 1.80])),
    ])

    res = gt.levenberg_marquardt(graph, initial)
    print(f"initial error: {float(graph.error(initial)):.6f}")
    print(f"final error:   {res.error:.6f} ({res.iterations} iters)")
    for name, key in (("x1", x1), ("x2", x2), ("x3", x3),
                      ("l1", l1), ("l2", l2)):
        print(f"  {name}: {np.asarray(res.values.at(key)).round(4)}")

    # marginal covariances (reference prints Marginals for all five)
    from gtsam_tpu.nonlinear.marginals import Marginals
    marg = Marginals(graph, res.values)
    print("l1 covariance:\n", np.asarray(marg.marginal_covariance(l1)).round(5))
    return res


if __name__ == "__main__":
    main()
