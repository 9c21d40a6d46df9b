"""SFMExample analog: batch structure-from-motion on the canonical synthetic
scene — 8 cameras circling a cube of 8 landmarks, GenericProjectionFactor
residuals, gauge fixed by a pose prior + a landmark prior, LM.

Reference: examples/SFMExample.cpp (+ SFMdata.h createPoints/createPoses).
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
from gtsam_tpu.slam import factors as slam_factors

K = np.array([50.0, 50.0, 0.0, 50.0, 50.0])    # Cal3_S2 fx fy s u0 v0


def createPoints(d=10.0):
    return np.array([[d, d, d], [-d, d, d], [-d, -d, d], [d, -d, d],
                     [d, d, -d], [-d, d, -d], [-d, -d, -d], [d, -d, -d]])


def createPoses(n=8, radius=30.0):
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        c = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        z = -c / np.linalg.norm(c)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        poses.append((np.stack([x, y, z], axis=1), c))
    return poses


def build(rng=None):
    rng = rng or np.random.default_rng(7)
    X, L = gt.shorthand("x"), gt.shorthand("l")
    pts, poses = createPoints(), createPoses()
    graph = gt.FactorGraph()
    pk, lk, uvs = [], [], []
    for i, (R, t) in enumerate(poses):
        for j, p in enumerate(pts):
            pc = R.T @ (p - t)
            if pc[2] <= 0.1:
                continue
            uv = np.asarray(uncalibrate_cal3s2(jnp.asarray(K),
                                               jnp.asarray(pc[:2] / pc[2])))
            pk.append(X(i)), lk.append(L(j))
            uvs.append(uv + rng.normal(scale=0.1, size=2))
    graph.add(slam_factors.generic_projection_factors(
        pk, lk, np.asarray(uvs), K, gt.noise.isotropic(2, 0.1)))
    # gauge: prior on x0 (0.1 rad / 0.3 m like the reference) + prior on l0
    R0, t0 = poses[0]
    graph.add(gt.prior_factors("SE3", [X(0)], SE3(R0[None], t0[None]),
                               gt.noise.sigmas([[0.1] * 3 + [0.3] * 3])))
    graph.add(gt.prior_factors("Point3", [L(0)], pts[:1],
                               gt.noise.isotropic(3, 0.1)))
    entries = []
    for i, (R, t) in enumerate(poses):
        dR = np.asarray(so3.expmap(jnp.asarray(
            rng.normal(scale=0.05, size=3))))
        entries.append((X(i), "SE3",
                        SE3(jnp.asarray(R @ dR),
                            jnp.asarray(t + rng.normal(scale=0.3, size=3)))))
    for j, p in enumerate(pts):
        entries.append((L(j), "Point3", p + rng.normal(scale=0.3, size=3)))
    return graph, gt.Values.from_entries(entries), pts, poses, (X, L)


def main():
    graph, initial, pts, poses, (X, L) = build()
    print(f"initial error: {float(graph.error(initial)):.3f}")
    res = gt.levenberg_marquardt(graph, initial,
                                 gt.LMParams(max_iterations=30))
    print(f"final error: {res.error:.6f} ({res.iterations} iterations)")
    pe = [float(jnp.linalg.norm(res.values.at(X(i)).t - jnp.asarray(t)))
          for i, (_R, t) in enumerate(poses)]
    le = [float(jnp.linalg.norm(res.values.at(L(j)) - jnp.asarray(p)))
          for j, p in enumerate(pts)]
    print(f"max pose err {max(pe):.3f} m, max landmark err {max(le):.3f} m")
    return res


if __name__ == "__main__":
    main()
