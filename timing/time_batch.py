"""timeBatch analog: batch LM wall time on the shipped pose-graph datasets.

Reference: timing/timeBatch.cpp (LM total/per-iteration time on 2D/3D
datasets).  Prints per-dataset load, init, and optimize timings.

Usage: python timing/time_batch.py [--datasets w100.graph,sphere2500.txt]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_one(name):
    import gtsam_tpu as gt
    from gtsam_tpu.io import datasets
    from gtsam_tpu.slam import initialize as init_mod

    path = datasets.find_example_data(name)
    t0 = time.time()
    if name.endswith(".graph") or "w1" in name or "w2" in name \
            or "victoria" in name:
        (graph, initial), dim = datasets.load_2d(path), 3
        tname = "SE2"
    else:
        (graph, initial), dim = datasets.load_3d(path), 6
        tname = "SE3"
    t_load = time.time() - t0
    import jax
    m0 = jax.tree.map(lambda a: np.asarray(a)[None], initial.at(0))
    graph.add(gt.prior_factors(tname, [0], m0,
                               gt.noise.sigmas([[1e-3] * dim])))
    t0 = time.time()
    init = init_mod.initialize_pose3_chordal(graph) if tname == "SE3" \
        else initial
    t_init = time.time() - t0
    t0 = time.time()
    res = gt.levenberg_marquardt(graph, init, gt.LMParams(max_iterations=20))
    t_lm = time.time() - t0
    print(f"{name:22s} load {t_load:6.2f}s  init {t_init:6.2f}s  "
          f"LM {t_lm:7.2f}s / {res.iterations:2d} iters "
          f"({t_lm / max(res.iterations, 1) * 1e3:7.1f} ms/iter)  "
          f"half-chi2 {res.error:.6g}")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", default="w100.graph,sphere2500.txt")
    args = ap.parse_args()
    for name in args.datasets.split(","):
        run_one(name.strip())


if __name__ == "__main__":
    main()
