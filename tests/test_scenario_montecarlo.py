"""Monte-Carlo covariance consistency of IMU preintegration.

Reference idiom: gtsam/navigation/tests/testImuFactor.cpp (ScenarioRunner's
estimateCovariance vs preintMeasCov, EXPECT(assert_equal(..., 0.1)) class
checks) — the propagated 9x9 preintegration covariance must match the
sample covariance of Monte-Carlo rollouts with discrete sensor noise.
"""

import numpy as np
import pytest

from gtsam_tpu.navigation import scenario as sc
from gtsam_tpu.navigation.preintegration import PreintegrationParams

GRAVITY = (0.0, 0.0, -9.81)


def _consistency(runner, T, N=200, seed=7):
    """Return (mc_cov, prop_cov) both 9x9 in [theta, dp, dv] tangent."""
    mc = runner.estimate_covariance(T, N=N, seed=seed)
    pim = runner.integrate(T)           # noiseless: mean trajectory
    prop = np.asarray(pim.cov)
    return mc, prop


def _check(mc, prop, rel=0.35):
    """Diagonal-wise relative agreement (the reference uses assert_equal
    with ~1e-1 tolerances on these; MC error at N=200 is ~10-20%)."""
    d_mc, d_pr = np.diagonal(mc), np.diagonal(prop)
    scale = np.maximum(d_pr, 1e-16)
    assert np.all(np.abs(d_mc - d_pr) <= rel * scale + 1e-14), (
        d_mc, d_pr)
    # off-diagonal correlation structure: compare in normalized units
    s = 1.0 / np.sqrt(scale)
    C_mc = mc * np.outer(s, s)
    C_pr = prop * np.outer(s, s)
    assert np.max(np.abs(C_mc - C_pr)) < 0.5


@pytest.mark.parametrize("w,v", [
    ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0)),          # static (testImuFactor.cpp)
    ((0.0, 0.0, 0.3), (1.0, 0.0, 0.0)),          # circular motion
    ((0.1, 0.2, 0.3), (1.0, 0.5, 0.0)),          # general twist
])
def test_preint_cov_matches_monte_carlo(w, v):
    params = PreintegrationParams(gravity=GRAVITY,
                                  accel_sigma=0.1, gyro_sigma=0.01,
                                  integration_sigma=0.0)
    scen = sc.constant_twist(w, v)
    runner = sc.ScenarioRunner(scen, params, imu_dt=1e-2)
    mc, prop = _consistency(runner, T=0.5)
    _check(mc, prop)


def test_preint_cov_matches_monte_carlo_with_bias():
    """Nonzero actual bias, estimated-at-zero bias_hat: covariance
    consistency is about noise propagation, independent of the bias error
    (ScenarioRunner is constructed WITH the bias so measurements carry it,
    and predictions use bias=0 consistently)."""
    params = PreintegrationParams(gravity=GRAVITY,
                                  accel_sigma=0.05, gyro_sigma=0.005,
                                  integration_sigma=0.0)
    scen = sc.constant_twist((0.0, 0.0, 0.2), (0.8, 0.0, 0.0))
    bias = np.array([0.05, -0.03, 0.02, 0.002, -0.001, 0.003])
    runner = sc.ScenarioRunner(scen, params, imu_dt=1e-2, bias=bias)
    # predict with bias_hat = actual bias: rollouts differ from exact only
    # through noise
    rng = np.random.default_rng(11)
    from gtsam_tpu.navigation.navstate import local as nav_local
    exact = scen.nav_state(0.5)
    samples = []
    for _ in range(150):
        pim = runner.integrate(0.5, bias_hat=bias, rng=rng)
        pred = runner.predict(pim, bias=bias)
        samples.append(np.asarray(nav_local(exact, pred)))
    X = np.stack(samples); X -= X.mean(0)
    mc = X.T @ X / (len(X) - 1)
    prop = np.asarray(runner.integrate(0.5, bias_hat=bias).cov)
    _check(mc, prop, rel=0.4)


def test_integration_sigma_inflates_position_cov():
    """integrationCovariance adds to the dp block only
    (PreintegrationParams.h integrationCovariance semantics)."""
    scen = sc.constant_twist((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    base = PreintegrationParams(gravity=GRAVITY, accel_sigma=0.1,
                                gyro_sigma=0.01, integration_sigma=0.0)
    infl = PreintegrationParams(gravity=GRAVITY, accel_sigma=0.1,
                                gyro_sigma=0.01, integration_sigma=0.1)
    c0 = np.asarray(sc.ScenarioRunner(scen, base, 1e-2).integrate(0.5).cov)
    c1 = np.asarray(sc.ScenarioRunner(scen, infl, 1e-2).integrate(0.5).cov)
    dp = slice(3, 6)
    assert np.all(np.diagonal(c1[dp, dp]) > np.diagonal(c0[dp, dp]))
    th = slice(0, 3)
    assert np.allclose(c1[th, th], c0[th, th])
