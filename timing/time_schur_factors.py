"""timeSchurFactors analog: per-track Schur-complement kernel timings by
track length — implicit (matvec) vs explicit (Hessian blocks) styles.

Reference: timing/timeSchurFactors.cpp (RegularImplicitSchurFactor vs
JacobianFactorQ vs HessianFactor, for 2..50 cameras per track).

For each track length M, times on a batch of T tracks:
  project   — A = Q F projection (JacobianFactorQ linearization)
  hessian   — explicit per-track F'QF camera-block Hessian
  matvec    — implicit y = F'Q(QF v) Schur matvec (CG building block)

Usage: python timing/time_schur_factors.py [--tracks 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=512)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gtsam_tpu.geometry.se3 import SE3
    from gtsam_tpu.slam.smart import smart_projection_factors, \
        smart_hessian_blocks

    rng = np.random.default_rng(0)
    T = args.tracks
    print(f"T={T} tracks on {jax.devices()[0]}", flush=True)
    print(f"{'M':>4} {'project ms':>12} {'hessian ms':>12} {'matvec ms':>12}",
          flush=True)

    def timed(fn, *a, reps=args.reps):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    for M in (2, 3, 4, 6, 8, 12, 16, 24, 32):
        n_cams = max(M * 2, 16)
        # cameras on a ring looking at the origin-centered cloud
        th = np.linspace(0, 2 * np.pi, n_cams, endpoint=False)
        t_cam = np.stack([np.cos(th) * 10, np.sin(th) * 10,
                          np.zeros(n_cams)], axis=1)
        R_cam = np.stack([np.eye(3)] * n_cams)
        poses = SE3(jnp.asarray(R_cam), jnp.asarray(t_cam))
        pose_keys = np.stack(
            [rng.choice(n_cams, size=M, replace=False) for _ in range(T)])
        meas = rng.normal(scale=100.0, size=(T, M, 2)) + 300.0
        K_s2 = np.array([500.0, 500.0, 0.0, 320.0, 240.0])

        sb = smart_projection_factors(pose_keys, meas, K_s2, 1.0,
                                      mode="JACOBIAN_Q")
        xs = tuple(jax.tree.map(lambda a: a[jnp.asarray(pose_keys[:, s])],
                                poses) for s in range(M))

        @jax.jit
        def project(xs):
            return jax.vmap(sb.linearize_fn)(xs, sb.measurements)

        @jax.jit
        def hessian(xs):
            A, b = jax.vmap(sb.linearize_fn)(xs, sb.measurements)
            Astk = jnp.concatenate(A, axis=2)      # (T, 2M, 6M)
            H = jnp.einsum("tri,trj->tij", Astk, Astk)
            g = jnp.einsum("tri,tr->ti", Astk, b)
            return H, g

        v = jnp.asarray(rng.normal(size=(T, M, 6)))

        @jax.jit
        def matvec(xs, v):
            A, _ = jax.vmap(sb.linearize_fn)(xs, sb.measurements)
            Astk = jnp.concatenate(A, axis=2)
            Av = jnp.einsum("tri,ti->tr", Astk, v.reshape(T, -1))
            return jnp.einsum("tri,tr->ti", Astk, Av)

        tp = timed(project, xs)
        thess = timed(hessian, xs)
        tmv = timed(matvec, xs, v)
        print(f"{M:>4} {tp*1e3:>12.2f} {thess*1e3:>12.2f} {tmv*1e3:>12.2f}",
              flush=True)


if __name__ == "__main__":
    main()
