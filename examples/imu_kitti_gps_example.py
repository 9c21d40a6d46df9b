"""IMUKittiExampleGPS analog: IMU + GPS fusion where the GPS fixes arrive as
geodetic lat/lon/alt and are projected into a local ENU frame (the reference
uses GeographicLib through its KITTI data prep; gtsam_tpu ships a pure-numpy
WGS84 port in navigation/geodesy.py).

Reference: examples/IMUKittiExampleGPS.cpp + gtsam/navigation/GPSFactor.h
(GeographicLib LocalCartesian workflow).
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
from gtsam_tpu.navigation.geodesy import LocalCartesian
from gtsam_tpu.navigation.navstate import NavState
from gtsam_tpu.navigation.preintegration import (
    PreintegrationParams, preintegrate)

GRAVITY = np.array([0.0, 0.0, -9.81])
ORIGIN = (49.0111, 8.4231, 115.0)          # Karlsruhe-ish, KITTI country


def main(n_kf=8, dt_kf=1.0, imu_dt=5e-3, seed=3):
    params = PreintegrationParams(gravity=tuple(GRAVITY))
    enu = LocalCartesian(*ORIGIN)
    w, v = np.array([0.0, 0.0, 0.15]), np.array([8.0, 0.0, 0.0])  # driving

    def pose(t):
        return se3.expmap(jnp.asarray(np.concatenate([w * t, v * t])))

    def nav_state(t):
        T = pose(t)
        return NavState(T.R, T.t, so3.rotate(T.R, jnp.asarray(v)))

    def imu(t):
        T = pose(t)
        a_nav = so3.rotate(T.R, jnp.asarray(np.cross(w, v)))
        return np.asarray(so3.unrotate(T.R, a_nav - jnp.asarray(GRAVITY)))

    rng = np.random.default_rng(seed)
    states = [nav_state(i * dt_kf) for i in range(n_kf)]
    # GPS arrives geodetic: true ENU -> lat/lon/alt (+noise), as a KITTI
    # OXTS stream would, then is projected back through the local frame
    gps_geodetic = [enu.reverse(np.asarray(s.p)) for s in states]
    gps_enu = np.stack([
        enu.forward(lat + rng.normal(scale=2e-7),    # ~2 cm horizontal
                    lon + rng.normal(scale=3e-7),
                    alt + rng.normal(scale=0.05))
        for (lat, lon, alt) in gps_geodetic])

    X, V, B = gt.shorthand("x"), gt.shorthand("v"), gt.shorthand("b")
    graph = gt.FactorGraph()
    pims = []
    for i in range(n_kf - 1):
        ts = np.arange(i * dt_kf, (i + 1) * dt_kf, imu_dt)
        accs = np.stack([imu(t) for t in ts]) + rng.normal(
            scale=0.02, size=(len(ts), 3))
        gyros = np.tile(w, (len(ts), 1)) + rng.normal(
            scale=0.002, size=(len(ts), 3))
        pims.append(preintegrate(accs, gyros, np.full(len(ts), imu_dt),
                                 np.zeros(6), params))
    pims_b = jax.tree.map(lambda *xs: jnp.stack(xs), *pims)
    ii = list(range(n_kf - 1))
    graph.add(nav_factors.imu_factors(
        [X(i) for i in ii], [V(i) for i in ii],
        [X(i + 1) for i in ii], [V(i + 1) for i in ii],
        [B(i) for i in ii], pims_b, params))
    graph.add(nav_factors.bias_between_factors(
        [B(i) for i in ii], [B(i + 1) for i in ii],
        params, np.full(n_kf - 1, dt_kf)))
    graph.add(nav_factors.gps_factors([X(i) for i in range(n_kf)], gps_enu,
                                      gt.noise.sigmas(
                                          [[0.05, 0.05, 0.1]] * n_kf)))
    graph.add(nav_factors.velocity_prior_factors(
        [V(0)], np.asarray(states[0].v)[None], gt.noise.isotropic(3, 0.2)))
    graph.add(nav_factors.bias_prior_factors([B(0)], np.zeros((1, 6)),
                                             gt.noise.isotropic(6, 0.1)))

    entries = []
    for i, s in enumerate(states):
        entries.append((X(i), "SE3", gt.SE3(
            s.R @ so3.expmap(jnp.asarray(rng.normal(scale=0.03, size=3))),
            jnp.asarray(gps_enu[i]))))
        entries.append((V(i), "Vec3", s.v + rng.normal(scale=0.3, size=3)))
        entries.append((B(i), "Vec6", jnp.zeros(6)))
    res = gt.levenberg_marquardt(graph, gt.Values.from_entries(entries),
                                 gt.LMParams(max_iterations=30))
    errs = [float(jnp.linalg.norm(res.values.at(X(i)).t - states[i].p))
            for i in range(n_kf)]
    print(f"final error {res.error:.3f}; position errors: "
          f"max {max(errs)*100:.1f}cm mean {np.mean(errs)*100:.1f}cm")
    # sanity: geodetic round trip at the scale of the trajectory
    rt = enu.forward(*enu.reverse(np.array([100.0, -50.0, 5.0])))
    assert np.allclose(rt, [100.0, -50.0, 5.0], atol=1e-6)
    assert max(errs) < 0.25
    return res


if __name__ == "__main__":
    main()
