"""CombinedImuFactorsExample analog: the 6-way CombinedImuFactor (pose_i,
vel_i, pose_j, vel_j, bias_i, bias_j) with its joint 15x15 preintegrated
covariance — bias evolution rides inside the factor instead of a separate
BetweenFactor.

Reference: examples/CombinedImuFactorsExample.cpp,
gtsam/navigation/CombinedImuFactor.h.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.geometry import se3, so3
from gtsam_tpu.navigation import factors as nav_factors
from gtsam_tpu.navigation.navstate import NavState
from gtsam_tpu.navigation.preintegration import (
    PreintegrationParams, preintegrate_combined)

GRAVITY = np.array([0.0, 0.0, -9.81])


def main(n_kf=6, dt_kf=0.5, imu_dt=1e-3):
    params = PreintegrationParams(gravity=tuple(GRAVITY))
    w, v = np.array([0.0, 0.0, 0.3]), np.array([1.0, 0.0, 0.0])

    def pose(t):
        return se3.expmap(jnp.asarray(np.concatenate([w * t, v * t])))

    def nav_state(t):
        T = pose(t)
        return NavState(T.R, T.t, so3.rotate(T.R, jnp.asarray(v)))

    def imu(t):
        T = pose(t)
        a_nav = so3.rotate(T.R, jnp.asarray(np.cross(w, v)))
        return np.asarray(so3.unrotate(T.R, a_nav - jnp.asarray(GRAVITY))), w

    X, V, B = gt.shorthand("x"), gt.shorthand("v"), gt.shorthand("b")
    rng = np.random.default_rng(1)
    graph = gt.FactorGraph()
    cpims = []
    for i in range(n_kf - 1):
        ts = np.arange(i * dt_kf, (i + 1) * dt_kf, imu_dt)
        accs = np.stack([imu(t)[0] for t in ts]) + rng.normal(
            scale=0.01, size=(len(ts), 3))
        gyros = np.tile(w, (len(ts), 1)) + rng.normal(
            scale=0.001, size=(len(ts), 3))
        cpims.append(preintegrate_combined(
            accs, gyros, np.full(len(ts), imu_dt), np.zeros(6), params))
    cpims_b = jax.tree.map(lambda *xs: jnp.stack(xs), *cpims)

    ii = list(range(n_kf - 1))
    graph.add(nav_factors.combined_imu_factors(
        [X(i) for i in ii], [V(i) for i in ii],
        [X(i + 1) for i in ii], [V(i + 1) for i in ii],
        [B(i) for i in ii], [B(i + 1) for i in ii], cpims_b, params))

    states = [nav_state(i * dt_kf) for i in range(n_kf)]
    gps = np.stack([np.asarray(s.p) for s in states])
    gps += rng.normal(scale=0.05, size=gps.shape)
    graph.add(nav_factors.gps_factors([X(i) for i in range(n_kf)], gps,
                                      gt.noise.isotropic(3, 0.05)))
    graph.add(nav_factors.velocity_prior_factors(
        [V(0)], np.asarray(states[0].v)[None], gt.noise.isotropic(3, 0.1)))
    graph.add(nav_factors.bias_prior_factors([B(0)], np.zeros((1, 6)),
                                             gt.noise.isotropic(6, 0.1)))

    entries = []
    for i, s in enumerate(states):
        entries.append((X(i), "SE3", gt.SE3(
            s.R @ so3.expmap(jnp.asarray(rng.normal(scale=0.05, size=3))),
            s.p + rng.normal(scale=0.3, size=3))))
        entries.append((V(i), "Vec3", s.v + rng.normal(scale=0.2, size=3)))
        entries.append((B(i), "Vec6", jnp.zeros(6)))
    res = gt.levenberg_marquardt(graph, gt.Values.from_entries(entries),
                                 gt.LMParams(max_iterations=30))
    errs = [float(jnp.linalg.norm(res.values.at(X(i)).t - states[i].p))
            for i in range(n_kf)]
    print(f"final error {res.error:.4f}; position errors: "
          f"max {max(errs)*100:.1f}cm mean {np.mean(errs)*100:.1f}cm")
    assert max(errs) < 0.25
    return res


if __name__ == "__main__":
    main()
