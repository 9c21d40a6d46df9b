"""Pose2SLAMExample_g2o analog: command-line 2D pose-graph SLAM.

Read a g2o file, optimize with LM (optionally under a Huber kernel), and
write the optimized graph back out as g2o.

Reference: examples/Pose2SLAMExample_g2o.cpp (argv: input, output,
maxIterations, kernel none|huber).

Usage:
  python examples/pose2_slam_g2o_cli.py [input.g2o] [output.g2o] \
      [--max-iterations N] [--kernel none|huber]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.base import losses
from gtsam_tpu.io import datasets


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?",
                    default=datasets.find_example_data("noisyToyGraph.txt"))
    ap.add_argument("output", nargs="?", default=None)
    ap.add_argument("--max-iterations", type=int, default=100)
    ap.add_argument("--kernel", choices=["none", "huber"], default="none")
    args = ap.parse_args(argv)

    graph, initial = datasets.load_2d(args.input)
    if args.kernel == "huber":
        # reference: noiseModel::Robust(mEstimator::Huber(1.345), gaussian)
        import dataclasses
        graph = gt.FactorGraph([
            dataclasses.replace(
                b, noise=gt.noise.robust(b.noise, losses.huber(1.345)))
            for b in graph.batches])
    # gauge prior on the first pose (the reference adds a Prior on key 0)
    graph.add(gt.prior_factors(
        "SE2", [0], np.asarray(initial.at(0))[None],
        gt.noise.sigmas([[1e-6, 1e-6, 1e-8]])))

    print(f"initial error: {float(graph.error(initial)):.6f}")
    res = gt.levenberg_marquardt(
        graph, initial, gt.LMParams(max_iterations=args.max_iterations))
    print(f"final error: {res.error:.6f}  ({res.iterations} iterations)")

    if args.output:
        datasets.write_g2o(args.output, graph, res.values)
        print(f"wrote {args.output}")
    return res


if __name__ == "__main__":
    main()
