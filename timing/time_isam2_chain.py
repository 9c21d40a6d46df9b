"""timeiSAM2Chain analog: per-update cost of ISAM2 on a growing 2D chain.

Reference: timing/timeiSAM2Chain.cpp.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt


def main(n=120, report_every=20):
    isam = gt.ISAM2(gt.ISAM2Params(relinearize_skip=10,
                                   relinearize_threshold=0.1))
    isam.update(
        [gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                          gt.noise.sigmas([[0.01, 0.01, 0.01]]))],
        [(0, "SE2", np.zeros(3))])
    rng = np.random.default_rng(0)
    times = []
    for i in range(1, n):
        meas = np.array([1.0, 0.0, 0.0]) + rng.normal(scale=0.02, size=3)
        b = gt.between_factors("SE2", [i - 1], [i], meas[None],
                               gt.noise.sigmas([[0.05, 0.05, 0.02]]))
        guess = np.asarray(isam.calculate_estimate().at(i - 1)) + \
            np.array([1.0, 0, 0])
        t0 = time.time()
        isam.update([b], [(i, "SE2", guess)])
        times.append(time.time() - t0)
        if i % report_every == 0:
            print(f"step {i}: {times[-1]*1e3:.1f} ms/update "
                  f"(mean last {report_every}: "
                  f"{np.mean(times[-report_every:])*1e3:.1f} ms)")
    print(f"total: {sum(times):.1f}s  mean {np.mean(times)*1e3:.1f} ms/update")
    return times


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
