"""timeCholesky / timeMatrixOps analog: dense kernel micro-benchmarks on the
current backend — batched Cholesky, triangular solve, matmul, and the staged
blocked Cholesky (linear/dense_blocked.py) across sizes.

Reference: timing/timeCholesky.cpp, timeMatrixOps.cpp.

Usage: python timing/time_cholesky.py [--sizes 64,128,256,512,1024]
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
    ap.add_argument("--sizes", default="64,128,256,512,1024")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gtsam_tpu.linear import dense_blocked

    print(f"backend: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    for n in (int(s) for s in args.sizes.split(",")):
        A = rng.normal(size=(n, n))
        S1 = jnp.asarray(A @ A.T + n * np.eye(n), dtype=jnp.float32)
        B = args.batch
        Ab = rng.normal(size=(B, n, n))
        Sb = jnp.asarray(np.einsum("bij,bkj->bik", Ab, Ab)
                         + n * np.eye(n), dtype=jnp.float32)
        rhs = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)

        t_chol = timeit(jax.jit(jnp.linalg.cholesky), S1)
        t_bchol = timeit(jax.jit(jnp.linalg.cholesky), Sb)
        t_staged = timeit(jax.jit(dense_blocked.blocked_cholesky), S1)
        L = jnp.linalg.cholesky(S1)
        t_tri = timeit(jax.jit(lambda L, r: jax.lax.linalg.triangular_solve(
            L, r[:, None], left_side=True, lower=True)), L, rhs)
        t_mm = timeit(jax.jit(lambda a: a @ a), S1)
        gf = n ** 3 / 3 / 1e9
        print(f"n={n:5d}: chol {t_chol*1e3:8.3f} ms ({gf/t_chol:6.1f} GF/s)"
              f"  batched[{B}] {t_bchol*1e3:8.3f} ms"
              f"  staged {t_staged*1e3:8.3f} ms"
              f"  trisolve {t_tri*1e3:7.3f} ms"
              f"  matmul {t_mm*1e3:7.3f} ms "
              f"({2*n**3/1e9/t_mm:7.1f} GF/s)")


if __name__ == "__main__":
    main()
