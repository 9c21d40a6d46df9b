"""StereoVOExample analog: two stereo camera poses observing three landmarks,
solved with Gauss-Newton; first pose held by a tight prior.

Reference: examples/StereoVOExample.cpp (Cal3_S2Stereo, GenericStereoFactor).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.slam.factors import stereo_factors
from gtsam_tpu.base.keys import symbol


def main():
    x1, x2 = symbol("x", 1), symbol("x", 2)
    l1, l2, l3 = symbol("l", 1), symbol("l", 2), symbol("l", 3)
    # Cal3_S2Stereo: fx fy s u0 v0 (+ baseline passed separately)
    K = np.array([1000.0, 1000.0, 0.0, 320.0, 240.0])
    baseline = 0.2

    graph = gt.FactorGraph()
    graph.add(gt.prior_factors(
        "SE3", [x1], gt.SE3(np.eye(3)[None], np.zeros((1, 3))),
        gt.noise.sigmas([[1e-6] * 6])))
    st_noise = gt.noise.sigmas([[1.0, 1.0, 1.0]] * 6)
    # synthesize (uL, uR, v) from the ground truth: x1 at origin, x2 one
    # meter forward, landmarks at z=5/5/3 (reference scene geometry)
    from gtsam_tpu.geometry.cameras import stereo_project
    from gtsam_tpu.geometry.se3 import SE3 as SE3g
    import jax.numpy as jnp
    gt_poses = {x1: SE3g(jnp.eye(3), jnp.zeros(3)),
                x2: SE3g(jnp.eye(3), jnp.asarray([0.0, 0.0, 1.0]))}
    gt_pts = {l1: jnp.asarray([1.0, 1.0, 5.0]),
              l2: jnp.asarray([-1.0, 1.0, 5.0]),
              l3: jnp.asarray([0.0, -0.5, 3.0])}
    pairs = [(x1, l1), (x1, l2), (x1, l3), (x2, l1), (x2, l2), (x2, l3)]
    meas = np.stack([np.asarray(stereo_project(gt_poses[p], jnp.asarray(K),
                                               baseline, gt_pts[l])[0])
                     for p, l in pairs])
    graph.add(stereo_factors([x1, x1, x1, x2, x2, x2],
                             [l1, l2, l3, l1, l2, l3], meas, K, baseline,
                             st_noise))

    initial = gt.Values.from_entries([
        (x1, "SE3", gt.SE3(np.eye(3), np.zeros(3))),
        (x2, "SE3", gt.SE3(np.eye(3), np.array([0.1, -0.1, 1.1]))),
        (l1, "Point3", np.array([1.0, 1.0, 5.0])),
        (l2, "Point3", np.array([-1.0, 1.0, 5.0])),
        (l3, "Point3", np.array([0.0, -0.5, 5.0])),
    ])
    res = gt.levenberg_marquardt(graph, initial)
    print(f"final error: {res.error:.6f} ({res.iterations} iters)")
    print("x2 translation:", np.asarray(res.values.at(x2).t).round(4))
    for name, k in (("l1", l1), ("l2", l2), ("l3", l3)):
        print(f"  {name}: {np.asarray(res.values.at(k)).round(3)}")
    return res


if __name__ == "__main__":
    main()
