"""Multi-device scaling of the sharded local stages (SURVEY §5.8, BASELINE
scaling-efficiency item).

Runs the distributed-BA and distributed-pose-graph steps at n = 1, 2, 4, 8
devices with a FIXED total problem size and reports per-step wall time.  On
real TPU slices this measures strong scaling over ICI; on the CI host (one
process, n virtual CPU devices pinned to the same cores) the signal is the
SHARDING OVERHEAD: extra time vs n=1 = collective + padding + replication
cost of the SPMD program, since the flops executed are identical.

Each n runs in a subprocess (device count is fixed at backend init).
Usage: python timing/multichip_scaling.py            # the driver table
       python timing/multichip_scaling.py --one N    # a single measurement
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure_one(n: int):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gtsam_tpu.base import noise as noise_mod
    from gtsam_tpu.geometry.cameras import bal_retract
    from gtsam_tpu.graph import factors as factors_mod
    from gtsam_tpu.parallel import sharded_ba
    from gtsam_tpu.sfm import bal
    import __graft_entry__ as ge

    devices = jax.devices()[:n]
    mesh = Mesh(np.asarray(devices).reshape(n), ("tracks",))

    # FIXED total size across n (strong scaling)
    prob, cams, pts = ge._build_problem(256, 16384, 4)
    sst = sharded_ba.ShardedSchurStructure.build(
        prob.obs_cam, prob.obs_pt, prob.num_cameras, prob.num_points, n)
    order = sst.obs_order
    uv_sorted = prob.obs_uv[order]
    K = len(order)
    batch = factors_mod.custom_factors(
        "ProjectionBal", ("BalCamera", "Point3"),
        np.zeros((K, 2), dtype=np.int64),
        bal._projection_residual, 2,
        jnp.asarray(sst.scatter_obs(uv_sorted).reshape(-1, 2)),
        noise_mod.unit())
    obs_cam_flat = jnp.asarray(sst.obs_cam.reshape(-1))
    ndev, Kd = sst.obs_cam.shape
    pt_global = sst.obs_pt_local + sst.point_offset[:, None]
    pt_global = np.minimum(pt_global, prob.num_points - 1)
    obs_pt_flat = jnp.asarray(pt_global.reshape(-1))
    solver = sharded_ba.make_sharded_solver(mesh, sst)

    @jax.jit
    def full_step(cams, pts):
        cam_k = jax.tree.map(lambda a: a[obs_cam_flat], cams)
        pt_k = pts[obs_pt_flat]
        (A_cam, A_pt), b = factors_mod.linearize(batch, (cam_k, pt_k))
        A_cam = A_cam.reshape(ndev, Kd, 2, 9)
        A_pt = A_pt.reshape(ndev, Kd, 2, 3)
        b = b.reshape(ndev, Kd, 2)
        dc, dl = solver(A_cam, A_pt, b, jnp.asarray(1e-3))
        new_cams = jax.vmap(bal_retract)(cams, dc)
        dl_flat = dl.reshape(-1, 3)[:pts.shape[0]]
        return new_cams, pts + dl_flat

    out = full_step(cams, pts)
    jax.block_until_ready(out)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = full_step(cams, pts)
    jax.block_until_ready(out)
    ba_s = (time.time() - t0) / reps

    # pose-graph path
    import gtsam_tpu as gt
    from gtsam_tpu.geometry import se3 as se3_mod
    from gtsam_tpu.geometry.se3 import SE3
    from gtsam_tpu.parallel import sharded_posegraph

    rng = np.random.default_rng(0)
    n_poses = 1024
    th = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)
    t_true = np.stack([np.cos(th) * 20, np.sin(th) * 20, 0 * th], axis=1)
    R_true = np.stack([np.eye(3)] * n_poses)
    ki = list(range(n_poses - 1)) + [i for i in range(0, n_poses - 16, 16)]
    kj = list(range(1, n_poses)) + [i + 16 for i in range(0, n_poses - 16, 16)]
    ki, kj = np.asarray(ki), np.asarray(kj)
    Ti = SE3(jnp.asarray(R_true[ki]), jnp.asarray(t_true[ki]))
    Tj = SE3(jnp.asarray(R_true[kj]), jnp.asarray(t_true[kj]))
    meas = se3_mod.between(Ti, Tj)
    graph = gt.FactorGraph()
    graph.add(gt.prior_factors("SE3", [0], SE3(jnp.asarray(R_true[:1]),
                                               jnp.asarray(t_true[:1])),
                               gt.noise.isotropic(6, 1e-3)))
    graph.add(gt.between_factors("SE3", ki, kj, meas,
                                 gt.noise.isotropic(6, 0.05)))
    noisy_t = t_true + rng.normal(scale=0.2, size=t_true.shape)
    values = gt.Values.from_entries(
        [(i, "SE3", SE3(jnp.asarray(R_true[i]), jnp.asarray(noisy_t[i])))
         for i in range(n_poses)])
    pst = sharded_posegraph.ShardedPoseGraphStructure.build(
        ki, kj, n_poses, n)
    psolver = sharded_posegraph.make_sharded_pose_solver(
        mesh, pst, graph, values, axis="tracks")
    delta = psolver(values.arrays, jnp.asarray(1e-3))
    jax.block_until_ready(delta)
    t0 = time.time()
    for _ in range(reps):
        delta = psolver(values.arrays, jnp.asarray(1e-3))
    jax.block_until_ready(delta)
    pg_s = (time.time() - t0) / reps

    print(json.dumps({
        "n": n, "ba_step_s": round(ba_s, 4), "pg_step_s": round(pg_s, 4),
        "pg_separator": int(len(pst.separator)), "pg_poses": n_poses,
    }))


def main():
    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n}")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(n)],
            capture_output=True, text=True, env=env, timeout=1200)
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")]
        if not line:
            print(f"n={n}: FAILED\n{out.stderr[-2000:]}")
            continue
        row = json.loads(line[-1])
        rows.append(row)
        print(f"n={row['n']}: BA step {row['ba_step_s']*1e3:.1f} ms, "
              f"pose-graph step {row['pg_step_s']*1e3:.1f} ms "
              f"(separator {row['pg_separator']}/{row['pg_poses']})")
    if rows and rows[0]["n"] == 1:
        base_ba, base_pg = rows[0]["ba_step_s"], rows[0]["pg_step_s"]
        for r in rows[1:]:
            print(f"n={r['n']}: sharding overhead BA "
                  f"{(r['ba_step_s']/base_ba - 1)*100:+.0f}%  "
                  f"pose-graph {(r['pg_step_s']/base_pg - 1)*100:+.0f}% "
                  f"(same-total-flops virtual devices)")
    return rows


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        measure_one(int(sys.argv[2]))
    else:
        main()
