"""GNCExample analog: graduated non-convexity rejects gross outlier
measurements that plain least-squares would absorb.

A 2D pose chain gets clean odometry plus one wildly wrong loop closure; LM
alone is dragged off, GNC (TLS) downweights the outlier to ~zero and recovers
the clean trajectory.

Reference: examples/GNCExample.cpp (GncOptimizer<GncParams<...>> on a
Pose2 graph with outliers).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gtsam_tpu as gt


def build(n=8):
    graph = gt.FactorGraph()
    graph.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[1e-3] * 3])))
    ii, jj = np.arange(n - 1), np.arange(1, n)
    graph.add(gt.between_factors(
        "SE2", ii, jj, np.tile([1.0, 0.0, 0.0], (n - 1, 1)),
        gt.noise.sigmas([[0.05, 0.05, 0.02]] * (n - 1))))
    # a gross outlier loop closure claiming pose n-1 is back at pose 1
    graph.add(gt.between_factors(
        "SE2", [1], [n - 1], np.array([[0.0, 3.0, 1.5]]),
        gt.noise.sigmas([[0.05, 0.05, 0.02]])))
    initial = gt.Values.from_entries(
        [(k, "SE2", np.array([float(k), 0.0, 0.0])) for k in range(n)])
    return graph, initial


def main():
    graph, initial = build()
    lm = gt.levenberg_marquardt(graph, initial)
    # setKnownInliers analog: odometry and the prior are trusted; GNC
    # robustifies only the loop-closure batch (GncParams.h knownInliers)
    gnc = gt.gnc_optimize(graph, initial,
                          gt.GncParams(loss_type="TLS", robust_batches=[2]))

    tail_lm = np.asarray(lm.values.at(7))
    tail = np.asarray(gnc.values.at(7))
    weights = [h for h in gnc.history
               if isinstance(h, tuple) and h[0] == "gnc_weights"][-1][1]
    print(f"LM  (outlier absorbed): x7 = {tail_lm.round(3)}")
    print(f"GNC (outlier rejected): x7 = {tail.round(3)}")
    print(f"GNC outlier-factor weight: {float(weights[-1][-1]):.4f}")

    # GNC must recover the clean chain; LM must not (sanity that the
    # outlier actually bites)
    assert np.allclose(tail, [7.0, 0.0, 0.0], atol=0.05)
    assert not np.allclose(tail_lm, [7.0, 0.0, 0.0], atol=0.05)
    # and the outlier factor's weight is driven to ~0
    assert float(weights[-1][-1]) < 0.01
    return gnc


if __name__ == "__main__":
    main()
