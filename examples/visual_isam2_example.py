"""VisualISAM2Example analog: incremental visual SLAM — poses enter one at a
time with projection factors to a fixed landmark set; ISAM2 updates
incrementally (reference examples/VisualISAM2Example.cpp: 8 poses circling a
cube of points, SFMdata.h).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.geometry import se3, so3
from gtsam_tpu.geometry.cameras import uncalibrate_cal3s2
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.slam import factors as slam_factors

K = np.array([50.0, 50.0, 0.0, 50.0, 50.0])


def createPoints():
    """SFMdata.h: 8 corners of a cube."""
    d = 10.0
    return np.array([[d, d, d], [-d, d, d], [-d, -d, d], [d, -d, d],
                     [d, d, -d], [-d, d, -d], [-d, -d, -d], [d, -d, -d]])


def createPoses(n=8, radius=30.0):
    """Cameras circling the cube, looking at the origin."""
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        c = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        z = -c / np.linalg.norm(c)               # look at origin
        x = np.cross(np.array([0.0, 0, 1]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        poses.append((np.stack([x, y, z], axis=1), c))
    return poses


def main():
    rng = np.random.default_rng(42)
    X, L = gt.shorthand("x"), gt.shorthand("l")
    pts = createPoints()
    poses = createPoses()
    isam = gt.ISAM2(gt.ISAM2Params(relinearize_skip=1,
                                   relinearize_threshold=0.01))

    for i, (R, t) in enumerate(poses):
        # measurements of all visible points
        pk, lk, uvs = [], [], []
        for j, p in enumerate(pts):
            pc = R.T @ (p - t)
            if pc[2] <= 0.1:
                continue
            uv = np.asarray(uncalibrate_cal3s2(jnp.asarray(K),
                                               jnp.asarray(pc[:2] / pc[2])))
            pk.append(X(i))
            lk.append(L(j))
            uvs.append(uv + rng.normal(scale=0.1, size=2))
        batches = [slam_factors.generic_projection_factors(
            pk, lk, np.asarray(uvs), K, gt.noise.isotropic(2, 0.1))]
        entries = []
        if i == 0:
            batches.append(gt.prior_factors(
                "SE3", [X(0)], SE3(R[None], t[None]),
                gt.noise.sigmas([[0.001] * 6])))
            entries += [(L(j), "Point3",
                         pts[j] + rng.normal(scale=0.3, size=3))
                        for j in range(len(pts))]
            # prior on first landmark to fix scale
            batches.append(gt.prior_factors("Point3", [L(0)], pts[:1],
                                            gt.noise.isotropic(3, 0.1)))
        dR = np.asarray(so3.expmap(jnp.asarray(rng.normal(scale=0.05, size=3))))
        entries.append((X(i), "SE3", SE3(jnp.asarray(R @ dR),
                                         jnp.asarray(t + rng.normal(scale=0.3, size=3)))))
        res = isam.update(batches, entries)
        print(f"pose {i}: error {res.error_after:.4f} "
              f"({res.factors_total} factors)")

    est = isam.calculate_estimate()
    errs = [float(jnp.linalg.norm(est.at(X(i)).t - jnp.asarray(t)))
            for i, (_R, t) in enumerate(poses)]
    print(f"max pose error: {max(errs):.3f} m (noise floor ~0.1px pixel noise)")
    return isam


if __name__ == "__main__":
    main()
