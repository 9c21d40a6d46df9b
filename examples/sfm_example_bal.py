"""SFMExample_bal analog: full BA on a BAL dataset with Schur elimination.

Reference: examples/SFMExample_bal.cpp, timing/timeSFMBAL.cpp.
Usage: python examples/sfm_example_bal.py [bal_file]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gtsam_tpu as gt
from gtsam_tpu.io.datasets import find_example_data
from gtsam_tpu.sfm import ba, bal


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else find_example_data(
        "dubrovnik-3-7-pre.txt")
    prob = bal.read_bal(path)
    print(f"{prob.num_cameras} cameras, {prob.num_points} points, "
          f"{prob.num_observations} observations")
    t0 = time.time()
    vals, info = ba.ba_optimize(prob, gt.LMParams(max_iterations=20), verbose=True)
    rms = (2 * info["error"] / prob.num_observations) ** 0.5
    print(f"done in {time.time()-t0:.1f}s: final 0.5*chi2={info['error']:.6g} "
          f"RMS={rms:.3f}px iters={info['iterations']}")
    return vals, info


if __name__ == "__main__":
    main()
