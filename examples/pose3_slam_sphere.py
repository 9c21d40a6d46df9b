"""Pose3SLAMExample analog: sphere2500 with chordal init + LM (sparse solver),
reporting chi2 and ATE vs groundtruth.

Reference: examples/Pose3SLAMExample_initializePose3Chordal.cpp + SolverComparer.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.io import datasets
from gtsam_tpu.slam.initialize import initialize_pose3_chordal
from gtsam_tpu.utils import metrics


def main(max_iterations=12):
    graph, initial = datasets.load_3d(datasets.find_example_data("sphere2500.txt"))
    k0 = sorted(initial.keys["SE3"])[0]
    graph.add(gt.prior_factors("SE3", [k0], gt.SE3(np.eye(3)[None], np.zeros((1, 3))),
                               gt.noise.sigmas([[1e-4] * 6])))
    t0 = time.time()
    vals0 = initialize_pose3_chordal(graph)
    print(f"chordal init: {time.time()-t0:.2f}s  error={float(graph.error(vals0)):.6g}")
    t0 = time.time()
    res = gt.levenberg_marquardt(
        graph, vals0, gt.LMParams(max_iterations=max_iterations, verbose=True),
        solver=gt.SparseSolver())
    print(f"LM: {time.time()-t0:.1f}s  chi2={2*res.error:.6g}")

    # ATE vs groundtruth
    _g2, gt_vals = datasets.load_3d(
        datasets.find_example_data("sphere2500_groundtruth.txt"))
    keys = sorted(res.values.keys["SE3"])
    est = np.stack([np.asarray(res.values.at(k).t) for k in keys])
    gtp = np.stack([np.asarray(gt_vals.at(k).t) for k in keys])
    print("ATE:", metrics.ate(est, gtp))
    return res


if __name__ == "__main__":
    main()
