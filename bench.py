"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: synthetic Ladybug-1723-scale bundle adjustment (1723 cameras, ~150k
points, ~600k observations — the BASELINE.json north-star shape; real BAL
downloads are unavailable in this zero-egress environment), measuring
time per LM iteration (linearize + Schur landmark elimination + reduced camera
solve + retract) on one TPU chip, after jit warmup.

vs_baseline: ratio versus the reference's CPU time for the same work.  The
reference cannot be built here (no Boost in the image), so the denominator is
the recorded estimate in baselines/reference_cpu.json when present; otherwise
vs_baseline = 1.0 and `value` stands alone as an absolute measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    scale = os.environ.get("BENCH_SCALE", "ladybug")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gtsam_tpu as gt
    from gtsam_tpu.geometry.cameras import BalCamera, bal_retract
    from gtsam_tpu.geometry.se3 import SE3
    from gtsam_tpu.graph import factors as factors_mod
    from gtsam_tpu.base import noise as noise_mod
    from gtsam_tpu.sfm import ba, bal, synthetic

    if scale == "small":
        M, N, OPP = 100, 5000, 4
    else:  # ladybug-1723 shape
        M, N, OPP = 1723, 150000, 4

    prob = synthetic.make_bal_problem(num_cameras=M, num_points=N,
                                      obs_per_point=OPP, seed=0)
    st, order = ba.SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                        prob.num_cameras, prob.num_points)
    uv = jnp.asarray(prob.obs_uv[order])
    K = len(st.obs_cam)
    batch = factors_mod.custom_factors(
        "ProjectionBal", ("BalCamera", "Point3"),
        np.zeros((K, 2), dtype=np.int64),
        bal._projection_residual, 2, uv, noise_mod.unit())
    obs_cam = jnp.asarray(st.obs_cam)
    obs_pt = jnp.asarray(st.obs_pt)

    import functools

    @jax.jit
    def lm_step(cams, pts, lam):
        cam_k = jax.tree.map(lambda a: a[obs_cam], cams)
        pt_k = pts[obs_pt]
        (A_cam, A_pt), b = factors_mod.linearize(batch, (cam_k, pt_k))
        dc, dl = ba.schur_solve(st, A_cam, A_pt, b, lam, mixed_precision=True)
        new_cams = jax.vmap(bal_retract)(cams, dc)
        new_pts = pts + dl
        r = factors_mod.residuals(batch, (cam_k, pt_k))
        return new_cams, new_pts, 0.5 * jnp.sum(r * r)

    cams = BalCamera(SE3(jnp.asarray(prob.cam_R), jnp.asarray(prob.cam_t)),
                     jnp.asarray(prob.cam_calib))
    pts = jnp.asarray(prob.points)

    # warmup (compile)
    t0 = time.time()
    out = lm_step(cams, pts, jnp.asarray(1e-4))
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # timed iterations
    iters = 5
    t0 = time.time()
    c, p = cams, pts
    for _ in range(iters):
        c, p, err = lm_step(c, p, jnp.asarray(1e-4))
    jax.block_until_ready((c, p, err))
    per_iter = (time.time() - t0) / iters

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "baselines", "reference_cpu.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_s = ref.get("bal_ladybug_lm_iter_seconds")
        if ref_s:
            vs_baseline = ref_s / per_iter

    print(json.dumps({
        "metric": f"BA LM time/iter, synthetic Ladybug-1723 shape "
                  f"({prob.num_cameras} cams, {prob.num_points} pts, "
                  f"{prob.num_observations} obs), mixed-precision Schur",
        "value": round(per_iter, 4),
        "unit": "s/iter",
        "vs_baseline": round(vs_baseline, 3),
        "extra": {"compile_s": round(compile_s, 1),
                  "final_half_chi2": float(err),
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
