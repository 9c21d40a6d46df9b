"""FixedLagSmootherExample analog: a robot driving forward with odometry and
sporadic unary "GPS-like" measurements, smoothed by the batch fixed-lag
smoother with a 2.0 s lag — old states are marginalized out as the window
slides.

Reference: examples/FixedLagSmootherExample.cpp (BatchFixedLagSmoother,
timestamped keys, lag 2.0, odometry + loose priors).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.graph import factors as factors_mod
from gtsam_tpu.nonlinear.fixed_lag import BatchFixedLagSmoother, FixedLagParams


def main():
    rng = np.random.default_rng(2)
    dt = 0.25                      # one state every 0.25 s
    lag = 2.0
    smoother = BatchFixedLagSmoother(FixedLagParams(lag=lag))

    # prior on x0 at the origin
    smoother.update(
        [gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                          gt.noise.sigmas([[0.3, 0.3, 0.1]]))],
        [(0, "SE2", np.zeros(3))], [(0, 0.0)])

    odo = np.array([0.5, 0.0, 0.0])      # 2 m/s forward
    est_final = None
    for k in range(1, 25):
        t = k * dt
        meas = odo + rng.normal(0, [0.05, 0.05, 0.01])
        batches = [factors_mod.between_factors(
            "SE2", np.asarray([k - 1]), np.asarray([k]),
            jnp.asarray(meas)[None], gt.noise.sigmas([[0.1, 0.1, 0.05]]))]
        if k % 4 == 0:                   # sporadic absolute fix
            gps = np.array([0.5 * k, 0.0, 0.0]) \
                + rng.normal(0, [0.1, 0.1, 0.05])
            batches.append(gt.prior_factors(
                "SE2", [k], gps[None], gt.noise.sigmas([[0.2, 0.2, 0.1]])))
        guess = np.array([0.5 * k, 0.0, 0.0]) + rng.normal(0, 0.02, 3)
        smoother.update(batches, [(k, "SE2", guess)], [(k, t)])
        est = smoother.calculate_estimate()
        active = sorted(smoother.timestamps)
        est_final = np.asarray(est.at(k))
        if k % 4 == 0:
            print(f"t={t:4.2f}  window=[{active[0]}..{active[-1]}] "
                  f"({len(active)} states)  x{k} = "
                  f"{np.round(est_final, 3)}")

    # the window must have slid: early states marginalized out
    active = sorted(smoother.timestamps)
    assert active[0] > 0, "lag window never slid"
    assert len(active) <= int(lag / dt) + 2
    # the final pose tracks the true trajectory (12 m traveled)
    assert abs(est_final[0] - 12.0) < 0.5, est_final
    return smoother


if __name__ == "__main__":
    main()
