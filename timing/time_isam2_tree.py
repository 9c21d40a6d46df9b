"""timeiSAM2Chain analog: per-update cost of ISAM2Tree on a growing chain.

Reference: timing/timeiSAM2Chain.cpp (chain of Pose2 between factors, one new
pose per update) + SolverComparer.cpp --incremental.  Reports per-update wall
time in buckets of 50 so flatness is visible, plus a final batch cross-check.

Usage: python timing/time_isam2_tree.py [n_steps] [--loops]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import gtsam_tpu as gt
from gtsam_tpu.graph import factors as factors_mod
from gtsam_tpu.nonlinear.isam2_tree import ISAM2Tree


def main(n=300, loops=True):
    isam = ISAM2Tree(relinearize_threshold=0.05, relinearize_skip=5)
    rng = np.random.default_rng(0)
    isam.update(
        [gt.prior_factors("SE2", [0], jnp.zeros((1, 3)),
                          gt.noise.sigmas([[1e-3] * 3]))],
        [(0, "SE2", jnp.zeros(3))])
    times = []
    for i in range(1, n + 1):
        meas = np.array([1.0, 0.0, 0.0]) + rng.normal(0, 0.02, 3)
        batches = [factors_mod.between_factors(
            "SE2", np.asarray([i - 1]), np.asarray([i]),
            jnp.asarray([meas]), gt.noise.sigmas([[0.1, 0.1, 0.05]]))]
        if loops and i % 50 == 0 and i >= 100:
            j = i - 100
            batches.append(factors_mod.between_factors(
                "SE2", np.asarray([i]), np.asarray([j]),
                jnp.asarray([[-100.0, 0.0, 0.0]]),
                gt.noise.sigmas([[0.2, 0.2, 0.1]])))
        t0 = time.time()
        isam.update(batches,
                    [(i, "SE2", jnp.asarray([float(i), 0.0, 0.0])
                      + rng.normal(0, 0.05, 3))])
        times.append(time.time() - t0)
    times = np.asarray(times)
    print(f"n={n} loops={loops}")
    for b0 in range(0, n, 50):
        blk = times[b0:b0 + 50]
        if len(blk):
            print(f"  updates {b0:4d}-{b0+len(blk):4d}: "
                  f"mean {blk.mean()*1e3:7.1f} ms  median "
                  f"{np.median(blk)*1e3:7.1f} ms  max {blk.max()*1e3:7.1f} ms")
    print(f"  last-25 mean: {times[-25:].mean()*1e3:.1f} ms/update")
    print("  stats:", isam.stats())
    return times


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 300
    main(n, loops="--no-loops" not in sys.argv)
