"""Dataset regression tests: batch optimization on the reference's shipped
pose-graph datasets must reproduce pinned converged chi2 values.

Reference idiom: examples/Data regressions driven by SolverComparer.cpp /
timeIncremental.cpp over w10000-class datasets (SURVEY §4 item 8).

Pinned values:
- sphere2500: 1138.97 is the REFERENCE's converged half-chi2, measured from
  real GTSAM on this host (baselines/reference_cpu.json
  sphere2500.converged_half_chi2); we assert we match it to its own parity
  band.
- w100 / victoria_park / w20000: self-measured converged values pinned at
  round 4 (the prebuilt reference binary can no longer run in this image —
  libgtsam.so is not shipped); these protect against optimizer/loader
  regressions and assert a sane relative decrease from the initial error.
"""

import numpy as np
import pytest

import gtsam_tpu as gt
from gtsam_tpu.io import datasets


def _optimize_2d(name, max_iterations=40):
    graph, initial = datasets.load_2d(datasets.find_example_data(name))
    graph.add(gt.prior_factors(
        "SE2", [0], np.asarray(initial.at(0))[None],
        gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])))
    res = gt.levenberg_marquardt(
        graph, initial, gt.LMParams(max_iterations=max_iterations))
    return graph, res


def test_w100_regression():
    graph, res = _optimize_2d("w100.graph")
    # pinned round-4 converged value (this host): 0.568927
    assert res.error < 0.5690
    assert res.error > 0.50     # a too-low value means the objective changed


@pytest.mark.slow
def test_victoria_park_regression():
    # 6968 odometry + 3640 bearing-range landmark edges (the reference's
    # classic Victoria Park set)
    graph, res = _optimize_2d("victoria_park.txt")
    # pinned round-4 converged value (this host): 310.8498
    assert res.error < 311.5
    assert res.error > 290.0


@pytest.mark.slow
def test_sphere2500_reference_parity():
    """Converged half-chi2 must match REAL GTSAM's converged value
    (baselines/reference_cpu.json: 1138.97, parity band +0.11)."""
    from gtsam_tpu.slam.initialize import initialize_pose3_chordal
    graph, initial = datasets.load_3d(
        datasets.find_example_data("sphere2500.txt"))
    graph.add(gt.prior_factors(
        "SE3", [0], gt.SE3(np.eye(3)[None], np.zeros((1, 3))),
        gt.noise.sigmas([[1e-3] * 3 + [1e-2] * 3])))
    vals0 = initialize_pose3_chordal(graph)
    res = gt.levenberg_marquardt(graph, vals0,
                                 gt.LMParams(max_iterations=15))
    assert res.error < 1139.08      # reference converged 1138.97
    assert res.error > 1100.0


@pytest.mark.slow
def test_w20000_regression():
    """w10000-class large 2D dataset (20k poses, EDGE2 format): LM must
    reach the low-chi2 basin (no absolute pin yet — see BENCH_NOTES for the
    measured value once recorded)."""
    graph, initial = datasets.load_2d(datasets.find_example_data(
        "w20000.txt"))
    graph.add(gt.prior_factors(
        "SE2", [0], np.asarray(initial.at(0))[None],
        gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])))
    e0 = float(graph.error(initial))
    res = gt.levenberg_marquardt(graph, initial,
                                 gt.LMParams(max_iterations=60))
    assert np.isfinite(res.error)
    assert res.error < 0.05 * e0
