"""SFMExample_SmartFactor analog: the same 8-camera / cube scene as
sfm_example.py, but with the landmarks eliminated inside smart projection
factors — only poses are variables; points are retriangulated per
linearization.

Also runs the PCG variant (SFMExample_SmartFactorPCG): the same smart graph
solved with the implicit-Schur conjugate-gradient solver instead of the
direct supernodal path.

Reference: examples/SFMExample_SmartFactor.cpp,
examples/SFMExample_SmartFactorPCG.cpp.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.geometry import so3
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.slam.smart import smart_projection_factors, triangulate_tracks

from sfm_example import K, createPoints, createPoses


def build(rng=None):
    rng = rng or np.random.default_rng(11)
    pts, poses = createPoints(), createPoses()
    n, m = len(poses), len(pts)
    from gtsam_tpu.geometry.cameras import uncalibrate_cal3s2
    uv = np.zeros((m, n, 2))
    mask = np.zeros((m, n), bool)
    for j, p in enumerate(pts):
        for i, (R, t) in enumerate(poses):
            pc = R.T @ (p - t)
            if pc[2] <= 0.1:
                continue
            uv[j, i] = np.asarray(uncalibrate_cal3s2(
                jnp.asarray(K), jnp.asarray(pc[:2] / pc[2])))
            uv[j, i] += rng.normal(scale=0.1, size=2)
            mask[j, i] = True
    keys = np.tile(np.arange(n), (m, 1))
    graph = gt.FactorGraph()
    graph.add(smart_projection_factors(keys, uv, mask, K, pixel_sigma=0.1))
    # gauge: tight prior on x0 + weak prior on x1 range (reference uses
    # priors on the first two poses to fix scale)
    R0, t0 = poses[0]
    R1, t1 = poses[1]
    graph.add(gt.prior_factors("SE3", [0], SE3(R0[None], t0[None]),
                               gt.noise.sigmas([[1e-4] * 6])))
    graph.add(gt.prior_factors("SE3", [1], SE3(R1[None], t1[None]),
                               gt.noise.sigmas([[10, 10, 10, 0.01, 10, 10]])))
    entries = []
    for i, (R, t) in enumerate(poses):
        dR = np.asarray(so3.expmap(jnp.asarray(
            rng.normal(scale=0.02, size=3))))
        entries.append((i, "SE3",
                        SE3(jnp.asarray(R @ dR),
                            jnp.asarray(t + rng.normal(scale=0.1, size=3)))))
    return graph, gt.Values.from_entries(entries), pts, poses, keys, uv, mask


def main():
    graph, initial, pts, poses, keys, uv, mask = build()
    res = gt.levenberg_marquardt(graph, initial,
                                 gt.LMParams(max_iterations=30))
    pe = [float(jnp.linalg.norm(res.values.at(i).t - jnp.asarray(t)))
          for i, (_R, t) in enumerate(poses)]
    print(f"smart-factor LM: error {res.error:.6f} "
          f"({res.iterations} iters), max pose err {max(pe)*100:.1f} cm")

    # PCG variant (SFMExample_SmartFactorPCG): implicit-Schur matvec
    try:
        from gtsam_tpu.linear.pcg import PCGSolver
        res_pcg = gt.levenberg_marquardt(
            graph, initial, gt.LMParams(max_iterations=30),
            solver=PCGSolver())
        print(f"smart-factor LM+PCG: error {res_pcg.error:.6f} "
              f"({res_pcg.iterations} iters)")
    except Exception as e:              # PCG path is optional here
        print(f"PCG variant skipped: {e}")

    # recover the landmarks by triangulating at the optimized poses
    tri_pts, _ok = triangulate_tracks(keys, uv, mask, K, res.values)
    le = np.abs(np.asarray(tri_pts) - pts).max()
    print(f"max triangulated landmark err {le:.3f} m")
    return res


if __name__ == "__main__":
    main()
