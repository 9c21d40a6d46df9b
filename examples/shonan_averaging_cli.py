"""ShonanAveragingCLI analog: certifiably-correct rotation averaging from a
pose-graph file.

Reads a 3D (or 2D) g2o/TORO file, extracts the relative-rotation edges, runs
the Shonan staircase with the power-method optimality certificate, and writes
a g2o file whose vertices carry the averaged rotations (translations kept
from the input initials).

Reference: examples/ShonanAveragingCLI.cpp (argv: -i input -o output).

Usage:
  python examples/shonan_averaging_cli.py [-i input.g2o] [-o output.g2o]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.io import datasets
from gtsam_tpu.sfm.shonan import ShonanParams, shonan_averaging


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input",
                    default=datasets.find_example_data("pose3example.txt"))
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--p-max", type=int, default=7)
    args = ap.parse_args(argv)

    graph, initial = datasets.load_3d(args.input)
    # relative-rotation edges from the between-factor batches
    edges = []
    n = 0
    for b in graph.batches:
        if b.keys.shape[1] != 2:
            continue
        import jax
        for r in range(b.num_factors):
            i, j = int(b.keys[r, 0]), int(b.keys[r, 1])
            meas = jax.tree.map(lambda a: np.asarray(a[r]), b.measurements)
            R = np.asarray(meas.R if hasattr(meas, "R") else meas[..., :3, :3])
            edges.append((i, j, R.reshape(3, 3)))
            n = max(n, i + 1, j + 1)
    print(f"{len(edges)} rotation edges over {n} poses")

    R_avg, lam_min = shonan_averaging(
        edges, n, ShonanParams(p_max=args.p_max, certify=True))
    print(f"Shonan done: lambda_min {lam_min:.3e} "
          f"({'certified optimal' if lam_min > -1e-4 else 'NOT certified'})")

    if args.output:
        from gtsam_tpu.geometry.se3 import SE3
        entries = [(k, "SE3", SE3(np.asarray(R_avg[k]),
                                  np.asarray(initial.at(k).t)))
                   for k in range(n)]
        datasets.write_g2o(args.output, graph,
                           gt.Values.from_entries(entries))
        print(f"wrote {args.output}")
    return R_avg, lam_min


if __name__ == "__main__":
    main()
