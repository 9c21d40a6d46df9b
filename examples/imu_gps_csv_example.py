"""ImuFactorsExample / IMUKittiExampleGPS analog driven by the REAL
imuAndGPSdata.csv: IMU measurements preintegrated between GPS fixes, a
bias chain, and GPS position factors, solved with batch LM.

CSV format (reference examples/ImuFactorsExample.cpp:150-236):
  first line:  i, <10 values>  initial state [x y z qx qy qz qw vx vy vz]
  type 0 rows: accX accY accZ omegaX omegaY omegaZ   (dt = 0.005 s)
  type 1 rows: x y z qx qy qz qw                     (GPS fix + orientation)

The Kitti variant (IMUKittiExampleGPS.cpp) is the same pipeline with the
metadata-file noise parameters; its IMU data file is not shipped in the
reference Data directory, so this example consumes imuAndGPSdata.csv.

Usage: python examples/imu_gps_csv_example.py [--csv PATH] [--max-gps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.io import datasets
from gtsam_tpu.navigation import factors as nav_factors
from gtsam_tpu.navigation.preintegration import (PreintegrationParams,
                                                 preintegrate)

DT = 0.005     # fixed IMU rate in the reference example


def load_csv(path):
    init_state = None
    imu_chunks, gps_rows = [], []
    cur = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if not parts or parts[0] == "":
                continue
            if parts[0] == "i":
                init_state = np.asarray([float(x) for x in parts[1:]])
            elif parts[0] == "0":
                cur.append([float(x) for x in parts[1:7]])
            elif parts[0] == "1":
                imu_chunks.append(np.asarray(cur))
                cur = []
                gps_rows.append([float(x) for x in parts[1:8]])
    return init_state, imu_chunks, np.asarray(gps_rows)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv",
                    default=datasets.find_example_data("imuAndGPSdata.csv"))
    ap.add_argument("--max-gps", type=int, default=40,
                    help="number of GPS fixes (keyframes) to use")
    args = ap.parse_args(argv)

    init_state, imu_chunks, gps = load_csv(args.csv)
    n = min(args.max_gps, len(gps))
    print(f"{n} GPS fixes, {sum(len(c) for c in imu_chunks[:n])} IMU rows")

    # the noise model the CSV was generated under
    # (ImuFactorsExample.cpp:87-98); NOTE MakeSharedD(0.0): the synthetic
    # data has ZERO gravity
    params = PreintegrationParams(accel_sigma=0.0003924,
                                  gyro_sigma=0.000205689024915,
                                  integration_sigma=1e-8,
                                  bias_acc_sigma=0.004905,
                                  bias_omega_sigma=0.000001454441043,
                                  gravity=(0.0, 0.0, 0.0))
    X, V, B = gt.shorthand("x"), gt.shorthand("v"), gt.shorthand("b")
    graph = gt.FactorGraph()

    pims, dts = [], []
    for k in range(n):
        rows = imu_chunks[k]
        if len(rows) == 0:      # no IMU between fixes: tiny still segment
            rows = np.zeros((1, 6))
        pims.append(preintegrate(rows[:, :3], rows[:, 3:],
                                 np.full(len(rows), DT), np.zeros(6), params))
        dts.append(len(rows) * DT)
    pims_b = jax.tree.map(lambda *xs: jnp.stack(xs), *pims)
    graph.add(nav_factors.imu_factors(
        [X(k) for k in range(n)], [V(k) for k in range(n)],
        [X(k + 1) for k in range(n)], [V(k + 1) for k in range(n)],
        [B(k) for k in range(n)], pims_b, params))
    graph.add(nav_factors.bias_between_factors(
        [B(k) for k in range(n)], [B(k + 1) for k in range(n)],
        params, np.asarray(dts)))
    # GPS position factors on every fix (noise 1.0 m, reference GPS_NOISE)
    graph.add(nav_factors.gps_factors(
        [X(k + 1) for k in range(n)], gps[:n, :3],
        gt.noise.isotropic(3, 1.0)))

    # priors at the initial state
    q = init_state[3:7]
    R0 = np.asarray(_quat_to_R(q))
    graph.add(gt.prior_factors("SE3", [X(0)],
                               gt.SE3(R0[None], init_state[:3][None]),
                               gt.noise.sigmas([[0.1] * 3 + [0.3] * 3])))
    graph.add(nav_factors.velocity_prior_factors(
        [V(0)], init_state[7:10][None], gt.noise.isotropic(3, 0.1)))
    graph.add(nav_factors.bias_prior_factors(
        [B(0)], np.zeros((1, 6)), gt.noise.isotropic(6, 1e-3)))

    entries = [(X(0), "SE3", gt.SE3(jnp.asarray(R0),
                                    jnp.asarray(init_state[:3]))),
               (V(0), "Vec3", jnp.asarray(init_state[7:10])),
               (B(0), "Vec6", jnp.zeros(6))]
    for k in range(n):      # init pose k+1 at its GPS fix
        entries += [(X(k + 1), "SE3",
                     gt.SE3(jnp.asarray(_quat_to_R(gps[k, 3:7])),
                            jnp.asarray(gps[k, :3]))),
                    (V(k + 1), "Vec3", jnp.zeros(3)),
                    (B(k + 1), "Vec6", jnp.zeros(6))]

    initial = gt.Values.from_entries(entries)
    print(f"initial error: {float(graph.error(initial)):.3f}")
    res = gt.levenberg_marquardt(graph, initial,
                                 gt.LMParams(max_iterations=40))
    errs = [float(jnp.linalg.norm(res.values.at(X(k + 1)).t
                                  - jnp.asarray(gps[k, :3])))
            for k in range(n)]
    print(f"final error: {res.error:.4f} ({res.iterations} iterations); "
          f"GPS residual max {max(errs):.2f} m mean {np.mean(errs):.2f} m")
    return res


def _quat_to_R(q):
    """[qx qy qz qw] -> rotation matrix."""
    x, y, z, w = q
    nrm = np.sqrt(x * x + y * y + z * z + w * w)
    if nrm < 1e-12:
        return np.eye(3)
    x, y, z, w = x / nrm, y / nrm, z / nrm, w / nrm
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])


if __name__ == "__main__":
    main()
