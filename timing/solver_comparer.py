"""SolverComparer analog: batch vs incremental on real pose-graph datasets.

Reference: examples/SolverComparer.cpp:17-142 (--batch / --incremental /
--compare modes over w10000-class datasets).  Incremental mode feeds factors
in pose order into ISAM2Tree (one update per new pose, timeIncremental.cpp
style) and reports per-update timing buckets; batch mode runs chordal-init LM;
compare mode checks the two solutions agree.

Usage:
  python timing/solver_comparer.py --mode batch|incremental|compare \
      [--dataset /root/reference/examples/Data/sphere2500.txt] [--n 600]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load(dataset):
    import gtsam_tpu as gt
    from gtsam_tpu.io import datasets

    if dataset.endswith(".graph") or "w100" in dataset:
        return datasets.load_2d(dataset), "SE2", 3
    return datasets.load_3d(dataset), "SE3", 6


def run_batch(dataset, verbose=True):
    import jax.numpy as jnp
    import gtsam_tpu as gt
    from gtsam_tpu.slam import initialize as init_mod

    (graph, initial), tname, dim = load(dataset)
    graph.add(gt.prior_factors(tname, [0],
                               (np.zeros((1, 3)) if dim == 3
                                else initial.at(0)[None] * 0),
                               gt.noise.sigmas([[1e-3] * dim])))
    t0 = time.time()
    if tname == "SE3":
        init = init_mod.initialize_pose3_chordal(graph)
    else:
        init = init_mod.initialize_pose2_lago(graph)
    t_init = time.time() - t0
    t0 = time.time()
    res = gt.levenberg_marquardt(graph, init,
                                 gt.LMParams(max_iterations=20))
    t_lm = time.time() - t0
    if verbose:
        print(f"batch: init {t_init:.2f}s, LM {t_lm:.2f}s "
              f"({res.iterations} iters), half_chi2 {res.error:.6g}")
    return res


def run_incremental(dataset, n_poses=None, verbose=True, json_out=None,
                    optimization="gn"):
    """Feed factors in pose order, one ISAM2Tree update per new pose.

    Writes an auditable JSON artifact (json_out) with the raw per-update
    wall times, cumulative wall, and p50/p95/max so the claimed numbers can
    be re-derived from the file (reference: timeIncremental.cpp:169-263
    prints the same buckets)."""
    import jax.numpy as jnp
    import gtsam_tpu as gt
    from gtsam_tpu.graph import factors as factors_mod
    from gtsam_tpu.nonlinear.isam2_tree import ISAM2Tree

    t_setup = time.time()
    (graph, initial), tname, dim = load(dataset)
    # explode batches into per-factor (keys, measurement, noise) host records
    per_pose = {}
    for b in graph.batches:
        if b.keys.shape[1] != 2:
            continue
        for i in range(b.num_factors):
            k1, k2 = int(b.keys[i, 0]), int(b.keys[i, 1])
            per_pose.setdefault(max(k1, k2), []).append((b, i))

    import jax
    isam = ISAM2Tree(relinearize_threshold=0.1, relinearize_skip=10,
                     optimization=optimization)
    m0 = jax.tree.map(lambda a: a[None], initial.at(0))
    isam.update([gt.prior_factors(tname, [0], m0,
                                  gt.noise.sigmas([[1e-3] * dim]))],
                [(0, tname, initial.at(0))])
    t_setup = time.time() - t_setup
    times = []
    keys = sorted(per_pose)
    if n_poses:
        keys = keys[:n_poses]
    t_start = time.time()
    for step, k in enumerate(keys):
        new_batches = [factors_mod.slice_batch(b, np.asarray([i]))
                       for (b, i) in per_pose[k]]
        t0 = time.time()
        isam.update(new_batches, [(k, tname, initial.at(k))])
        times.append(time.time() - t0)
        if verbose and (step + 1) % 50 == 0:
            w = times[-50:]
            print(f"  update {step+1}: mean {np.mean(w)*1e3:.1f} ms "
                  f"(last-50), max {np.max(w)*1e3:.1f} ms, "
                  f"cumulative {time.time()-t_start:.1f} s")
    wall = time.time() - t_start
    ts = np.asarray(times)
    stats = dict(
        dataset=os.path.basename(dataset),
        n_updates=int(len(ts)),
        optimization=optimization,
        setup_s=round(t_setup, 3),
        cumulative_wall_s=round(wall, 3),
        first_update_s=round(float(ts[0]), 3) if len(ts) else None,
        mean_ms=round(float(ts.mean() * 1e3), 1),
        p50_ms=round(float(np.percentile(ts, 50) * 1e3), 1),
        p95_ms=round(float(np.percentile(ts, 95) * 1e3), 1),
        max_ms=round(float(ts.max() * 1e3), 1),
        last50_mean_ms=round(float(ts[-50:].mean() * 1e3), 1),
        raw_update_s=[round(float(t), 4) for t in ts],
    )
    if verbose:
        print(f"incremental: {stats['n_updates']} updates, "
              f"cumulative {stats['cumulative_wall_s']} s, "
              f"first {stats['first_update_s']} s, "
              f"mean {stats['mean_ms']} ms, p50 {stats['p50_ms']} ms, "
              f"p95 {stats['p95_ms']} ms, max {stats['max_ms']} ms")
    if json_out:
        import json
        with open(json_out, "w") as f:
            json.dump(stats, f, indent=1)
        print(f"wrote {json_out}")
    return isam, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="compare",
                    choices=["batch", "incremental", "compare"])
    ap.add_argument("--dataset",
                    default="/root/reference/examples/Data/sphere2500.txt")
    ap.add_argument("--n", type=int, default=None,
                    help="incremental: number of poses to feed")
    ap.add_argument("--json", default=None,
                    help="incremental: write per-update timing stats here")
    ap.add_argument("--optimization", default="gn", choices=["gn", "dogleg"])
    args = ap.parse_args()

    if args.mode in ("batch", "compare"):
        res = run_batch(args.dataset)
    if args.mode in ("incremental", "compare"):
        isam, _ = run_incremental(args.dataset, n_poses=args.n,
                                  json_out=args.json,
                                  optimization=args.optimization)
    if args.mode == "compare":
        import jax.numpy as jnp
        vals = isam.calculate_estimate()
        n = args.n or len(res.values)
        # compare common keys' estimates (gauge-aligned by pose 0)
        diffs = []
        for k in range(min(50, n)):
            if k in vals and k in res.values:
                a = np.asarray(vals.at(k) if not hasattr(vals.at(k), "t")
                               else vals.at(k).t)
                b = np.asarray(res.values.at(k) if not hasattr(
                    res.values.at(k), "t") else res.values.at(k).t)
                diffs.append(np.abs(a - b).max())
        print(f"compare: max estimate diff over first {len(diffs)} poses: "
              f"{max(diffs):.4f}")


if __name__ == "__main__":
    main()
