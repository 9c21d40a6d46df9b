"""Pose2SLAMExample_g2o analog: 2D pose graph from a g2o file, GN/LM optimize.

Reference: examples/Pose2SLAMExample_g2o.cpp.
Usage: python examples/pose2_slam_example.py [file.g2o] [--lago]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.io import datasets


def main():
    path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else datasets.find_example_data("noisyToyGraph.txt")
    graph, initial = datasets.load_2d(path)
    graph.add(gt.prior_factors(
        "SE2", [sorted(initial.keys["SE2"])[0]],
        np.zeros((1, 3)), gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])))
    if "--lago" in sys.argv:
        from gtsam_tpu.slam.initialize import initialize_pose2_lago
        initial = initialize_pose2_lago(graph)
    print(f"{graph.num_factors} factors, {len(initial)} poses")
    print("initial error:", float(graph.error(initial)))
    res = gt.gauss_newton(graph, initial)
    print(f"final error: {res.error:.6f} after {res.iterations} iterations")
    return res


if __name__ == "__main__":
    main()
