"""RangeISAMExample_plaza2 analog: incremental SLAM from odometry + ranges to
fixed radio beacons, fed pose-by-pose into ISAM2Tree (the Plaza dataset is
not shipped; a synthetic plaza-like loop stands in).

Reference: examples/RangeISAMExample_plaza2.cpp.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.base.keys import symbol
from gtsam_tpu.nonlinear.isam2_tree import ISAM2Tree
from gtsam_tpu.sam.factors import range_2d_factors


def main(n_poses=40, verbose=True):
    rng = np.random.default_rng(7)
    # ground truth: a loop around the plaza, 4 beacons at the corners
    th = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)
    gt_xy = np.stack([10 * np.cos(th), 10 * np.sin(th)], axis=1)
    gt_th = th + np.pi / 2
    beacons = np.array([[14.0, 0.0], [0.0, 14.0], [-14.0, 0.0],
                        [0.0, -14.0]])
    L = [symbol("l", j) for j in range(4)]

    isam = ISAM2Tree(relinearize_threshold=0.05)
    pose0 = np.array([gt_xy[0, 0], gt_xy[0, 1], gt_th[0]])
    # beacons get LOOSE priors with their initial guesses: a variable with
    # zero information would make the first factorization singular (the
    # reference example similarly seeds landmark estimates)
    beacon_guess = beacons + rng.normal(scale=1.0, size=beacons.shape)
    isam.update(
        [gt.prior_factors("SE2", [0], pose0[None],
                          gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])),
         gt.prior_factors("Point2", L, beacon_guess,
                          gt.noise.isotropic(2, 10.0))],
        [(0, "SE2", pose0)]
        + [(lk, "Point2", beacon_guess[j]) for j, lk in enumerate(L)])

    est_prev = pose0
    for k in range(1, n_poses):
        true_prev = np.array([gt_xy[k - 1, 0], gt_xy[k - 1, 1], gt_th[k - 1]])
        true_k = np.array([gt_xy[k, 0], gt_xy[k, 1], gt_th[k]])
        from gtsam_tpu.geometry import se2
        odo = np.asarray(se2.between(true_prev, true_k))
        odo = odo + rng.normal(scale=[0.05, 0.05, 0.01])
        guess = np.asarray(se2.compose(est_prev, odo))
        facs = [gt.between_factors("SE2", [k - 1], [k], odo[None],
                                   gt.noise.sigmas([[0.05, 0.05, 0.01]]))]
        # a range to one beacon every pose (round-robin)
        j = k % 4
        r = np.linalg.norm(gt_xy[k] - beacons[j]) + rng.normal(scale=0.3)
        facs.append(range_2d_factors([k], [L[j]], np.asarray([r]),
                                     gt.noise.isotropic(1, 0.3)))
        isam.update(facs, [(k, "SE2", guess)])
        est_prev = np.asarray(isam.estimate_of(k))

    est = isam.calculate_estimate()
    errs = []
    for k in range(n_poses):
        e = np.asarray(est.at(k))[:2] - gt_xy[k]
        errs.append(np.linalg.norm(e))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    if verbose:
        print(f"{n_poses} poses, 4 beacons: ATE {ate:.3f} m "
              f"(odometry-only drift would be much larger)")
        for j, lk in enumerate(L):
            print(f"  beacon {j}: est {np.round(np.asarray(est.at(lk)), 2)} "
                  f"true {beacons[j]}")
    assert ate < 1.0
    return ate


if __name__ == "__main__":
    main()
