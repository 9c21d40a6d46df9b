"""VisualISAMExample analog: incremental SFM with NonlinearISAM (the v1
periodic-relinearization estimator) — cameras orbit a cube of landmarks,
each new frame's projection factors are folded in incrementally.

Reference: examples/VisualISAMExample.cpp (NonlinearISAM with reorderInterval,
vs VisualISAM2Example.cpp which uses ISAM2 — see visual_isam2_example.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import gtsam_tpu as gt
from gtsam_tpu.geometry import se3
from gtsam_tpu.nonlinear.nonlinear_isam import NonlinearISAM
from gtsam_tpu.slam import factors as slam_factors

K = np.array([500.0, 500.0, 0.0, 320.0, 240.0])  # Cal3_S2


def make_scene(n_cams=6, radius=30.0):
    points = np.array([[10, 10, 10], [-10, 10, 10], [-10, -10, 10],
                       [10, -10, 10], [10, 10, -10], [-10, 10, -10],
                       [-10, -10, -10], [10, -10, -10]], dtype=float)
    poses = []
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        eye = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        z = -eye / np.linalg.norm(eye)           # look at origin
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        poses.append(gt.SE3(jnp.asarray(np.stack([x, y, z], 1)),
                            jnp.asarray(eye)))
    return poses, points


def project(pose, p):
    pc = np.asarray(se3.transform_to(pose, jnp.asarray(p)))
    uv = pc[:2] / pc[2]
    return np.array([K[0] * uv[0] + K[3], K[1] * uv[1] + K[4]])


def main():
    rng = np.random.default_rng(0)
    poses, points = make_scene()
    X, L = gt.shorthand("x"), gt.shorthand("l")
    isam = NonlinearISAM(reorder_interval=3)

    for i, pose in enumerate(poses):
        new_factors, new_vars = [], []
        pk = np.full(len(points), X(i))
        lk = np.array([L(j) for j in range(len(points))])
        uv = np.stack([project(pose, p) for p in points])
        uv += rng.normal(scale=1.0, size=uv.shape)
        new_factors.append(slam_factors.generic_projection_factors(
            pk, lk, uv, K, gt.noise.isotropic(2, 1.0)))
        noisy = se3.retract(pose, jnp.asarray(rng.normal(scale=0.05, size=6)))
        new_vars.append((X(i), "SE3", noisy))
        if i == 0:
            new_factors.append(gt.prior_factors(
                "SE3", [X(0)], se3.stack([pose]),
                gt.noise.sigmas([[1e-3] * 3 + [1e-2] * 3])))
            # landmark guesses + a scale-fixing prior on the first landmark
            for j, p in enumerate(points):
                new_vars.append((L(j), "Point3",
                                 jnp.asarray(p + rng.normal(scale=0.5, size=3))))
            new_factors.append(gt.prior_factors(
                "Point3", [L(0)], points[:1], gt.noise.isotropic(3, 0.1)))
        isam.update(new_factors, new_vars)

    est = isam.estimate()
    errs = [float(np.linalg.norm(np.asarray(est.at(L(j))) - points[j]))
            for j in range(len(points))]
    print(f"landmark errors after {len(poses)} frames: "
          f"max {max(errs):.3f} mean {np.mean(errs):.3f}")
    assert max(errs) < 0.5
    return isam


if __name__ == "__main__":
    main()
