"""CameraResectioning analog: solve for the camera pose that observes four
known 3D landmarks at known image points (single-variable resectioning via a
custom projection residual).

Reference: examples/CameraResectioning.cpp (ResectioningFactor on X(1) with
Cal3_S2(1,1,0,50,50), landmarks at (+-10, +-10, 0) mapping to the image
corners; expected answer: camera at (0,0,2) looking down).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.geometry import so3
from gtsam_tpu.geometry.cameras import uncalibrate_cal3s2
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.graph import factors as factors_mod

K = jnp.asarray([1.0, 1.0, 0.0, 50.0, 50.0])   # fx fy s u0 v0


def resectioning_factors(key, points3d, uv, noise):
    """error = project(pose, P_i) - uv_i, one camera variable."""
    def fn(xs, meas):
        pose = xs[0]
        P, uv = meas
        pc = so3.unrotate(pose.R, P - pose.t)
        pn = pc[..., :2] / pc[..., 2:3]
        return uncalibrate_cal3s2(K, pn) - uv

    n = len(uv)
    return factors_mod.custom_factors(
        "Resectioning", ("SE3",), np.full((n, 1), key), fn, 2,
        (jnp.asarray(points3d), jnp.asarray(uv)), noise)


def main():
    pts = np.array([[10.0, 10.0, 0.0], [-10.0, 10.0, 0.0],
                    [-10.0, -10.0, 0.0], [10.0, -10.0, 0.0]])
    uv = np.array([[55.0, 45.0], [45.0, 45.0], [45.0, 55.0], [55.0, 55.0]])
    graph = gt.FactorGraph()
    graph.add(resectioning_factors(0, pts, uv, gt.noise.isotropic(2, 1.0)))

    # initial: at (0,0,1), looking down (Rz(pi) * Ry(pi) like the reference)
    R0 = np.diag([1.0, -1.0, -1.0])
    init = gt.Values.from_entries(
        [(0, "SE3", SE3(jnp.asarray(R0), jnp.asarray([0.0, 0.0, 1.0])))])
    res = gt.levenberg_marquardt(graph, init, gt.LMParams(max_iterations=20))
    pose = res.values.at(0)
    t = np.asarray(pose.t)
    print("resectioned camera center:", np.round(t, 6),
          "final error:", res.error)
    # reference answer: (0, 0, 2), R = [1,0,0; 0,-1,0; 0,0,-1]
    assert np.allclose(t, [0.0, 0.0, 2.0], atol=1e-4)
    assert np.allclose(np.asarray(pose.R), R0, atol=1e-5)
    return res


if __name__ == "__main__":
    main()
