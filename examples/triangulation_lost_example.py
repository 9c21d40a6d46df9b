"""TriangulationLOSTExample analog: compare DLT, LOST, and nonlinear
refinement accuracy over Monte-Carlo pixel noise, LOST's home turf (large
range disparity between observing cameras).

Reference: examples/TriangulationLOSTExample.cpp.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from gtsam_tpu.geometry import se3, so3, triangulation as tri
from gtsam_tpu.geometry.se3 import SE3


def look_at(eye, target):
    """Camera-to-world pose whose +z axis looks from eye toward target."""
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(z, [0.0, 0.0, 1.0])
    if np.linalg.norm(x) < 1e-9:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=1), np.asarray(eye, dtype=float)


def project(poses: SE3, point):
    """Normalized (calibrated) projections of a world point."""
    Rt = np.swapaxes(np.asarray(poses.R), -1, -2)
    pc = np.einsum("mij,mj->mi", Rt, point - np.asarray(poses.t))
    return pc[:, :2] / pc[:, 2:3]


def main(trials=200, sigma=5e-4, seed=0):
    landmark = np.array([0.0, 0.0, 10.0])
    eyes = np.array([[-2.0, 0.0, 0.0],    # near camera
                     [2.0, 0.0, 0.0],     # near camera
                     [0.0, 40.0, 8.0]])   # far camera (range disparity)
    Rs, ts = zip(*[look_at(e, landmark) for e in eyes])
    poses = SE3(jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts)))
    clean = project(poses, landmark)

    rng = np.random.default_rng(seed)
    errs = {"DLT": [], "LOST": [], "DLT+GN": []}
    for _ in range(trials):
        meas = jnp.asarray(clean + rng.normal(scale=sigma, size=clean.shape))
        dlt = tri.triangulate_dlt(poses, meas)
        lost = tri.triangulate_lost(poses, meas, measurement_sigma=sigma)
        nl = tri.triangulate_nonlinear(poses, meas, dlt.point)
        errs["DLT"].append(np.linalg.norm(np.asarray(dlt.point) - landmark))
        errs["LOST"].append(np.linalg.norm(np.asarray(lost.point) - landmark))
        errs["DLT+GN"].append(np.linalg.norm(np.asarray(nl.point) - landmark))

    rms = {k: float(np.sqrt(np.mean(np.square(v)))) for k, v in errs.items()}
    for k, v in rms.items():
        print(f"  {k:7s} rms error: {v * 1e3:.3f} mm")

    # LOST's range weighting must beat plain DLT here, and nonlinear
    # refinement is the gold standard
    assert rms["LOST"] < rms["DLT"]
    assert rms["DLT+GN"] <= rms["LOST"] * 1.2
    return rms


if __name__ == "__main__":
    main()
