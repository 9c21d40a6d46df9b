"""timeGaussianFactorGraph analog: linear-system assembly + factorize +
solve micro-benchmark on a synthetic 2D grid graph at several sizes.

Reference: timing/timeGaussianFactorGraph.cpp (planar grid elimination
timing).  Measures the supernodal pipeline stages separately: system
(linearize+assemble), factorize, back-substitution, and the fused
solve_refined_df.

Usage: python timing/time_gaussian_factor_graph.py [--sizes 10,20,30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(f, *a, n=10):
    import jax
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def grid_graph(m):
    """m x m planar Pose2 grid with right/up odometry edges."""
    import jax.numpy as jnp
    import gtsam_tpu as gt

    def vid(i, j):
        return i * m + j

    ki, kj, meas = [], [], []
    for i in range(m):
        for j in range(m):
            if j + 1 < m:
                ki.append(vid(i, j)), kj.append(vid(i, j + 1))
                meas.append([1.0, 0.0, 0.0])
            if i + 1 < m:
                ki.append(vid(i, j)), kj.append(vid(i + 1, j))
                meas.append([0.0, 1.0, 0.0])
    g = gt.FactorGraph()
    g.add(gt.between_factors("SE2", np.asarray(ki), np.asarray(kj),
                             jnp.asarray(np.asarray(meas)),
                             gt.noise.sigmas(np.tile([0.1, 0.1, 0.05],
                                                     (len(ki), 1)))))
    g.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                           gt.noise.sigmas([[1e-3] * 3])))
    rng = np.random.default_rng(0)
    vals = gt.Values.from_entries(
        [(vid(i, j), "SE2",
          np.array([j, i, 0.0]) + rng.normal(0, 0.05, 3))
         for i in range(m) for j in range(m)])
    return g, vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10,20,30")
    args = ap.parse_args()

    import jax
    from gtsam_tpu.linear.supernodal import SupernodalCholeskySolver

    print(f"backend: {jax.devices()[0]}")
    for m in (int(s) for s in args.sizes.split(",")):
        graph, vals = grid_graph(m)
        bound = graph.bind(vals)
        t0 = time.time()
        s = SupernodalCholeskySolver(bound)
        t_sym = time.time() - t0
        sysf = jax.jit(lambda a: s.system(a))
        blocks, g = sysf(vals.arrays)
        factf = jax.jit(lambda b: s.factorize(b, 1e-6))
        factored = factf(blocks)
        solvef = jax.jit(lambda f, g: s._solve_padded(f, g))
        fullf = jax.jit(lambda b, g: s.solve_refined_df(b, g, 1e-6,
                                                        refine_iters=1))
        t_sys = timeit(sysf, vals.arrays)
        t_fac = timeit(factf, blocks)
        t_sol = timeit(solvef, factored, g)
        t_full = timeit(fullf, blocks, g)
        print(f"grid {m:3d}x{m:<3d} ({m*m:6d} poses, "
              f"{len(s.sym.levels):2d} levels, order={s.chosen_order}): "
              f"symbolic {t_sym:6.2f}s  system {t_sys*1e3:7.2f} ms  "
              f"factorize {t_fac*1e3:7.2f} ms  solve {t_sol*1e3:6.2f} ms  "
              f"refined {t_full*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
