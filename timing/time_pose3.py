"""timePose3 / timeRot3 analog: geometry-op micro-benchmarks — vmapped
expmap/logmap/compose/between/retract throughput for SO(3), SE(3), SE(2).

Reference: timing/timePose3.cpp, timeRot3.cpp (per-op ns on one core; the
TPU-native equivalent measures BATCHED throughput, which is what the solver
actually uses — per-factor ops never run scalar here).

Usage: python timing/time_pose3.py [--n 1000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(f, *a, n=20):
    import jax
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()
    N = args.n

    import jax
    import jax.numpy as jnp
    from gtsam_tpu.geometry import se2, se3, so3

    print(f"backend: {jax.devices()[0]}   batch N = {N}")
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.5, (N, 3)), jnp.float32)
    xi6 = jnp.asarray(rng.normal(0, 0.5, (N, 6)), jnp.float32)
    xi3 = jnp.asarray(rng.normal(0, 0.5, (N, 3)), jnp.float32)

    R = jax.jit(jax.vmap(so3.expmap))(w)
    T = jax.jit(jax.vmap(se3.expmap))(xi6)
    P2 = jax.jit(jax.vmap(se2.expmap))(xi3)

    rows = [
        ("Rot3::Expmap", lambda: jax.vmap(so3.expmap)(w)),
        ("Rot3::Logmap", lambda: jax.vmap(so3.logmap)(R)),
        ("Rot3::compose", lambda: jnp.einsum("nij,njk->nik", R, R)),
        ("Pose3::Expmap", lambda: jax.vmap(se3.expmap)(xi6)),
        ("Pose3::Logmap", lambda: jax.vmap(se3.logmap)(T)),
        ("Pose3::between", lambda: jax.vmap(se3.between)(T, T)),
        ("Pose3::retract", lambda: jax.vmap(se3.retract)(T, xi6)),
        ("Pose2::Expmap", lambda: jax.vmap(se2.expmap)(xi3)),
        ("Pose2::between", lambda: jax.vmap(se2.between)(P2, P2)),
    ]
    for name, fn in rows:
        t = timeit(jax.jit(fn))
        print(f"{name:16s} {t*1e3:8.3f} ms for {N} "
              f"({t/N*1e9:7.2f} ns/op, {N/t/1e6:8.1f} Mop/s)")


if __name__ == "__main__":
    main()
