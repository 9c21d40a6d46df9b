"""GPSFactor workflow on RAW lat/lon/alt fixes: WGS84 fixes are projected to
a local ENU frame by the geodesy module (GeographicLib LocalCartesian
subset), then fused with odometry as position priors on SE(3) poses.

Reference: gtsam/navigation/GPSFactor.h (expects positions already in a
local cartesian frame — GeographicLib does the projection in the reference's
workflows, e.g. IMUKittiExampleGPS preprocessing); here the projection is
part of the framework (gtsam_tpu.navigation.geodesy, SURVEY §2.9).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.graph import factors as factors_mod
from gtsam_tpu.navigation import geodesy


def gps_position_factors(keys, enu_xyz, noise):
    """GPSFactor analog: error = pose.t - measured ENU position."""
    def fn(xs, meas):
        return xs[0].t - meas

    return factors_mod.custom_factors(
        "GPSPosition", ("SE3",), np.asarray(keys).reshape(-1, 1), fn, 3,
        jnp.asarray(enu_xyz), noise)


def main():
    rng = np.random.default_rng(11)
    # ground truth: drive 50 m east at 47.37N (Zurich-ish), fixes every 5 m
    lat0, lon0, alt0 = 47.3769, 8.5417, 408.0
    lc = geodesy.LocalCartesian(lat0, lon0, alt0)
    n = 11
    true_e = np.linspace(0.0, 50.0, n)
    raw_fixes = []
    for e in true_e:
        lat, lon, alt = lc.reverse(np.array([e, 0.0, 0.0]))
        raw_fixes.append((lat + rng.normal(0, 2e-8),      # ~2 mm lat noise
                          lon + rng.normal(0, 2e-8),
                          alt + rng.normal(0, 0.01)))
    print(f"first raw fix: lat {raw_fixes[0][0]:.7f} lon {raw_fixes[0][1]:.7f}"
          f" alt {raw_fixes[0][2]:.2f}")

    # the framework consumes the RAW geodetic fixes directly:
    enu = np.stack([lc.forward(la, lo, al) for (la, lo, al) in raw_fixes])

    graph = gt.FactorGraph()
    graph.add(gps_position_factors(np.arange(n), enu,
                                   gt.noise.isotropic(3, 0.05)))
    # odometry between consecutive poses (5 m east steps, slightly noisy)
    odo = np.tile(np.array([5.0, 0.0, 0.0]), (n - 1, 1)) \
        + rng.normal(0, 0.02, (n - 1, 3))
    graph.add(gt.between_factors(
        "SE3", np.arange(n - 1), np.arange(1, n),
        SE3(jnp.tile(jnp.eye(3), (n - 1, 1, 1)), jnp.asarray(odo)),
        gt.noise.sigmas(np.tile([0.01] * 3 + [0.05] * 3, (n - 1, 1)))))

    init = gt.Values.from_entries(
        [(k, "SE3", SE3(jnp.eye(3), jnp.zeros(3))) for k in range(n)])
    res = gt.levenberg_marquardt(graph, init, gt.LMParams(max_iterations=15))
    est = np.asarray(res.values.arrays["SE3"].t)
    err = np.abs(est[:, 0] - true_e).max()
    print("estimated easting:", np.round(est[:, 0], 2))
    print("max easting error: %.3f m, final half-chi2 %.3f" % (err, res.error))
    assert err < 0.1
    # round-trip: project the last estimate back to geodetic
    lat, lon, alt = lc.reverse(est[-1])
    print(f"final pose as geodetic: {lat:.7f}, {lon:.7f}, {alt:.2f}")
    return res


if __name__ == "__main__":
    main()
