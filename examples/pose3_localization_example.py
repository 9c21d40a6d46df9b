"""Pose3Localization analog: 3D pose-graph odometry fused with GPS-like
translation priors on every pose — the graph the reference builds from a g2o
file plus simulated GPS.

Reference: examples/Pose3Localization.cpp (g2o 3D + GPSFactor on each pose).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import gtsam_tpu as gt
from gtsam_tpu.geometry import se3, so3
from gtsam_tpu.navigation import factors as nav_factors


def main(n=30, seed=0):
    rng = np.random.default_rng(seed)
    # ground truth: a helix
    ts = np.arange(n) * 0.4
    gt_xyz = np.stack([5 * np.cos(ts / 5), 5 * np.sin(ts / 5), 0.2 * ts], 1)
    gt_poses = [se3.SE3(so3.expmap(jnp.asarray([0.0, 0.0, ts[i] / 5])),
                        jnp.asarray(gt_xyz[i]))
                for i in range(n)]

    graph = gt.FactorGraph()
    # odometry with drift (measurements are an SE3 batch)
    rels = []
    for i in range(n - 1):
        rel = se3.between(gt_poses[i], gt_poses[i + 1])
        rels.append(se3.retract(rel, jnp.asarray(
            rng.normal(scale=0.02, size=6))))
    graph.add(gt.between_factors("SE3", np.arange(n - 1), np.arange(1, n),
                                 se3.stack(rels),
                                 gt.noise.isotropic(6, 0.02)))
    # GPS on every other pose (no prior needed: GPS fixes the gauge)
    gps_keys = np.arange(0, n, 2)
    gps_meas = gt_xyz[gps_keys] + rng.normal(scale=0.05, size=(len(gps_keys), 3))
    graph.add(nav_factors.gps_factors(gps_keys, gps_meas,
                                      gt.noise.isotropic(3, 0.05)))
    # weak rotation prior on the first pose (GPS leaves yaw of pose 0 loose
    # only through the odometry chain)
    graph.add(gt.prior_factors("SE3", [0], se3.stack([gt_poses[0]]),
                               gt.noise.sigmas([[0.1] * 3 + [1.0] * 3])))

    initial = gt.Values.from_entries(
        [(i, "SE3", se3.retract(
            se3.SE3(jnp.eye(3), jnp.asarray(gt_xyz[i])),
            jnp.asarray(rng.normal(scale=0.1, size=6))))
         for i in range(n)])
    res = gt.levenberg_marquardt(graph, initial)
    est = np.stack([np.asarray(res.values.at(i).t) for i in range(n)])
    rmse = float(np.sqrt(np.mean(np.sum((est - gt_xyz) ** 2, axis=1))))
    print(f"final error {res.error:.3f}, position rmse {rmse * 100:.2f} cm "
          f"({res.iterations} iters)")
    assert rmse < 0.08
    return res


if __name__ == "__main__":
    main()
