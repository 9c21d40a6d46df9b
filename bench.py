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

# TPU-native precision policy for the benchmark: f32 end-to-end (f64 on this
# TPU is software-emulated and multiplies compile time ~5-10x at this scale;
# chi2/ATE parity is validated separately in f64 on CPU by the test suite).
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")


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

    lm_params = gt.LMParams(max_iterations=30, relative_error_tol=1e-5)
    # single run; iteration 1 pays trace+compile, iterations 2+ are warm
    t0 = time.time()
    _vals, info = ba.ba_optimize(prob, lm_params, mixed_precision=True)
    compile_s = time.time() - t0
    warm = info["iter_times"][1:] or info["iter_times"]
    per_iter = sum(warm) / len(warm)
    err = info["error"]

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
        "extra": {"cold_s": round(compile_s, 1),
                  "final_half_chi2": float(err),
                  "iters": info["iterations"],
                  "converged": info["converged"],
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
