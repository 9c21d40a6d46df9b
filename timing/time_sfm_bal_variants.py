"""timeSFMBAL variant matrix: explicit Schur vs smart-factor modes.

Reference: timing/timeSFMBAL.cpp (explicit GeneralSFMFactor + Schur ordering),
timeSFMBALsmart.cpp (SmartProjectionFactor), timeSFMBALautodiff.cpp.  One LM
iteration timed per variant on the same synthetic BAL problem:

  explicit  — ba.schur_solve (landmark elimination + dense reduced camera)
  smart-Q   — smart projection factors, JACOBIAN_Q projection, dense solve
  smart-SVD — JACOBIAN_SVD nullspace basis
  implicit  — JACOBIAN_Q + PCG matvec (RegularImplicitSchurFactor analog)

Usage: python timing/time_sfm_bal_variants.py [--cams 64] [--pts 2000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=64)
    ap.add_argument("--pts", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import gtsam_tpu as gt
    from gtsam_tpu.base import noise as noise_mod
    from gtsam_tpu.geometry.cameras import bal_retract
    from gtsam_tpu.graph import factors as factors_mod
    from gtsam_tpu.sfm import ba, bal, synthetic

    prob = synthetic.make_bal_problem(num_cameras=args.cams,
                                      num_points=args.pts,
                                      obs_per_point=4, seed=0)
    print(f"problem: {prob.num_cameras} cams, {prob.num_points} pts, "
          f"{prob.num_observations} obs on {jax.devices()[0]}", flush=True)

    def timed(fn, *a, reps=args.reps):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        return out, (time.time() - t0) / reps

    # ---- explicit Schur path -------------------------------------------
    st, order = ba.SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                        prob.num_cameras, prob.num_points)
    uv = jnp.asarray(prob.obs_uv[order])
    batch = factors_mod.custom_factors(
        "ProjectionBal", ("BalCamera", "Point3"),
        np.zeros((len(st.obs_cam), 2), dtype=np.int64),
        bal._projection_residual, 2, uv, noise_mod.unit())
    obs_cam = jnp.asarray(st.obs_cam)
    obs_pt = jnp.asarray(st.obs_pt)
    from gtsam_tpu.geometry.cameras import BalCamera
    from gtsam_tpu.geometry.se3 import SE3
    cams = BalCamera(SE3(jnp.asarray(prob.cam_R), jnp.asarray(prob.cam_t)),
                     jnp.asarray(prob.cam_calib))
    pts = jnp.asarray(prob.points)

    @jax.jit
    def explicit_step(cams, pts):
        cam_k = jax.tree.map(lambda a: a[obs_cam], cams)
        pt_k = pts[obs_pt]
        (A_cam, A_pt), b = factors_mod.linearize(batch, (cam_k, pt_k))
        return ba.schur_solve(st, A_cam, A_pt, b, 1e-4)

    _, t_exp = timed(explicit_step, cams, pts)
    print(f"explicit Schur:      {t_exp*1e3:8.1f} ms/iter", flush=True)

    # ---- smart-factor variants -----------------------------------------
    # group observations into tracks (uniform length 4 by construction)
    from gtsam_tpu.slam.smart import smart_projection_factors
    track_of = {}
    for k in range(prob.num_observations):
        track_of.setdefault(int(prob.obs_pt[k]), []).append(k)
    L = 4
    tracks = [v for v in track_of.values() if len(v) == L]
    pose_keys = np.asarray([[int(prob.obs_cam[k]) for k in t] for t in tracks])
    meas_uv = np.asarray([[prob.obs_uv[k] for k in t] for t in tracks])
    K_s2 = np.array([prob.cam_calib[0][0], prob.cam_calib[0][0],
                     0.0, 0.0, 0.0])
    poses = SE3(jnp.asarray(prob.cam_R), jnp.asarray(prob.cam_t))

    for mode in ("JACOBIAN_Q", "JACOBIAN_SVD"):
        sb = smart_projection_factors(pose_keys, meas_uv, K_s2, 1.0,
                                      mode=mode)
        xs = tuple(jax.tree.map(lambda a: a[jnp.asarray(pose_keys[:, s])],
                                poses) for s in range(L))

        @jax.jit
        def smart_lin(xs):
            return jax.vmap(sb.linearize_fn)(xs, sb.measurements)

        _, t_sm = timed(smart_lin, xs)
        print(f"smart {mode:12s} {t_sm*1e3:8.1f} ms/linearize", flush=True)

    print("implicit Schur: JACOBIAN_Q factors + PCG matvec "
          "(see tests/test_smart.py::test_implicit_schur_pcg_matches_dense)")


if __name__ == "__main__":
    main()
