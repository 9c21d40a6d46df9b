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
    # reference-measured converged value 0.568954 (baselines/reference_2d
    # .json); ours 0.568927 under the exact-expmap convention
    assert res.error < 0.568954 * 1.001
    assert res.error > 0.50     # a too-low value means the objective changed


@pytest.mark.slow
def test_victoria_park_regression():
    # 6968 odometry + 3640 bearing-range landmark edges (the reference's
    # classic Victoria Park set)
    graph, res = _optimize_2d("victoria_park.txt")
    # REFERENCE parity (baselines/reference_2d.json): GTSAM's default LM
    # stops at 171085.93 on this exact objective (initial chi2 parity to 12
    # digits); we must at least beat that stopping point, and stay in the
    # regression band around our measured 40-iteration value 108847.40
    assert res.error < 171085.93
    assert 100000.0 < res.error < 111000.0


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

    # ATE parity vs the shipped groundtruth (BASELINE.json metric clause):
    # the noise-free edge chain composes to the true trajectory; the
    # optimized solution must align to it within the dataset's noise floor
    from gtsam_tpu.utils.metrics import ate
    _, gt_t = datasets.groundtruth_trajectory(
        datasets.find_example_data("sphere2500_groundtruth.txt"))
    est_t = np.asarray(res.values.arrays["SE3"].t, dtype=float)
    keys = np.asarray(res.values.keys["SE3"])
    est_t = est_t[np.argsort(keys)]
    m = ate(est_t, gt_t, align=True)
    # measured round 5: ours rmse 0.4058 m vs reference GTSAM 0.4308 m on
    # the same pipeline (baselines/reference_2d.json sphere2500_ate)
    assert m["rmse"] < 0.6, m


@pytest.mark.slow
def test_w20000_regression():
    """w10000-class large 2D dataset (20k poses, EDGE2 format, covariance
    noise semantics — see baselines/reference_2d.json).  The reference's
    default LM stalls at 13.5M half-chi2 by relative-decrease; ours must
    reach the low-chi2 basin (measured 4008.9 at 15 iterations, round 5)."""
    graph, initial = datasets.load_2d(datasets.find_example_data(
        "w20000.txt"))
    graph.add(gt.prior_factors(
        "SE2", [0], np.asarray(initial.at(0))[None],
        gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])))
    res = gt.levenberg_marquardt(graph, initial,
                                 gt.LMParams(max_iterations=15))
    assert np.isfinite(res.error)
    assert res.error < 4100.0        # measured 4008.94; also << ref's 13.5M
    assert res.error > 3000.0        # a lower value means objective changed
