"""sphere2500 Pose3 SLAM end-to-end (BASELINE.json configs[1])."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.io import datasets
from gtsam_tpu.slam.initialize import initialize_pose3_chordal


def main(max_iterations=15, verbose=True):
    import jax
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    graph, initial = datasets.load_3d(datasets.find_example_data("sphere2500.txt"))
    print(f"load: {time.time()-t0:.2f}s factors={graph.num_factors} vars={len(initial)}",
          flush=True)
    k0 = sorted(initial.keys["SE3"])[0]
    graph.add(gt.prior_factors("SE3", [k0], gt.SE3(np.eye(3)[None], np.zeros((1, 3))),
                               gt.noise.sigmas([[1e-4] * 6])))
    t0 = time.time()
    vals0 = initialize_pose3_chordal(graph)
    t_init = time.time() - t0
    print(f"chordal init: {t_init:.2f}s err={float(graph.error(vals0)):.6g}", flush=True)
    t0 = time.time()
    res = gt.levenberg_marquardt(
        graph, vals0, gt.LMParams(max_iterations=max_iterations, verbose=verbose))
    t_opt = time.time() - t0
    print(f"LM: {t_opt:.2f}s iters={res.iterations} final chi2={2*res.error:.6g}",
          flush=True)
    return dict(t_init=t_init, t_opt=t_opt, iters=res.iterations,
                chi2=2 * res.error, history=res.history)


if __name__ == "__main__":
    main()
