"""METISOrderingExample analog: solve the same graph under different
fill-reducing orderings (minimum-degree vs nested dissection vs natural) and
show the supernodal solver reaches the identical optimum while the symbolic
factorization sizes differ.

Reference: examples/METISOrderingExample.cpp (Ordering::Create with METIS vs
COLAMD on a small grid).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt


def grid_graph(rows=10, cols=10, seed=0):
    rng = np.random.default_rng(seed)
    n = rows * cols
    graph = gt.FactorGraph()
    graph.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[1e-3] * 3])))
    ii, jj, meas = [], [], []
    for r in range(rows):
        for c in range(cols):
            k = r * cols + c
            if c + 1 < cols:
                ii.append(k); jj.append(k + 1)
                meas.append([1.0, 0.0, 0.0])
            if r + 1 < rows:
                ii.append(k); jj.append(k + cols)
                meas.append([0.0, 1.0, 0.0])
    meas = np.asarray(meas) + rng.normal(scale=0.02, size=(len(ii), 3))
    graph.add(gt.between_factors("SE2", ii, jj, meas,
                                 gt.noise.isotropic(3, 0.05)))
    initial = gt.Values.from_entries(
        [(r * cols + c, "SE2",
          np.array([c, r, 0.0]) + rng.normal(scale=0.1, size=3))
         for r in range(rows) for c in range(cols)])
    return graph, initial


def main():
    graph, initial = grid_graph()
    results = {}
    for order in ("amd", "nd", "natural"):
        solver = gt.SparseSolver(order=order)
        res = gt.levenberg_marquardt(graph, initial, solver=solver)
        results[order] = res
        print(f"  order={order:8s} error {res.error:.6f} "
              f"({res.iterations} iters)")

    errs = [r.error for r in results.values()]
    assert max(errs) - min(errs) < 1e-5 * max(1.0, max(errs))
    return results


if __name__ == "__main__":
    main()
