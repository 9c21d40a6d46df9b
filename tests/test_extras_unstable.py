"""Tests for long-tail slam/unstable/navigation factors (slam/extras.py,
navigation/ahrs.py, manifold preintegration, MagPoseFactor).

Oracle style follows the reference tests: tiny fixture problems with known
answers + recovery-by-optimization (SURVEY.md §4 idiom 3)."""

import jax
import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.geometry import se3, so3
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.navigation import ahrs, aiding
from gtsam_tpu.navigation import preintegration as pre
from gtsam_tpu.navigation.navstate import NavState
from gtsam_tpu.slam import extras

rng = np.random.default_rng(3)


def _optimize(g, init, iters=30):
    res = gt.levenberg_marquardt(g, init, gt.LMParams(max_iterations=iters))
    return res.values


class TestPartialPrior:
    def test_pose3_partial(self):
        """Prior on tangent coords [3,4,5] (translation part of Log) only."""
        T = se3.expmap(jnp.asarray([0.1, -0.2, 0.3, 1.0, 2.0, 3.0]))
        full = se3.logmap(T)
        g = gt.FactorGraph()
        g.add(extras.partial_prior_factors(
            "SE3", [0], [3, 4, 5], np.asarray(full[3:])[None],
            gt.noise.isotropic(3, 0.01)))
        # weak full prior to fix the rotation gauge
        g.add(gt.prior_factors("SE3", [0], se3.stack([T]),
                               gt.noise.isotropic(6, 10.0)))
        init = gt.Values.from_entries([(0, "SE3", se3.identity())])
        out = _optimize(g, init)
        got = se3.logmap(out.at(0))
        np.testing.assert_allclose(np.asarray(got[3:]), np.asarray(full[3:]),
                                   atol=1e-3)


class TestBoundingConstraint:
    def test_range_bound(self):
        """Keep a point's x >= 1; start violated at x=0."""
        g = gt.FactorGraph()
        g.add(extras.bounding_constraints_1(
            "Point3", [0], lambda p: p[0], [1.0], is_greater_than=True))
        g.add(gt.prior_factors("Point3", [0], np.zeros((1, 3)),
                               gt.noise.isotropic(3, 1.0)))
        init = gt.Values.from_entries([(0, "Point3", jnp.zeros(3))])
        out = _optimize(g, init)
        assert float(out.at(0)[0]) > 0.97  # pulled up to the boundary

    def test_inactive_when_satisfied(self):
        b = extras.bounding_constraints_1(
            "Point3", [0], lambda p: p[0], [1.0], is_greater_than=True)
        vals = gt.Values.from_entries([(0, "Point3", jnp.asarray([5.0, 0, 0]))])
        g = gt.FactorGraph().add(b)
        assert float(g.error(vals)) == 0.0


class TestRotateFactors:
    def test_recover_rotation(self):
        """Recover iRc from rotated rotation increments (testRotateFactor style)."""
        iRc = so3.expmap(jnp.asarray([0.2, -0.1, 0.3]))
        zs = [so3.expmap(jnp.asarray(v)) for v in
              ([0.3, 0.1, -0.2], [-0.2, 0.4, 0.1], [0.1, -0.3, 0.25])]
        ps = [so3.expmap(so3.rotate(iRc, so3.logmap(z))) for z in zs]
        g = gt.FactorGraph()
        g.add(extras.rotate_factors([0, 0, 0], jnp.stack(ps), jnp.stack(zs),
                                    gt.noise.isotropic(3, 0.01)))
        init = gt.Values.from_entries([(0, "SO3", so3.identity())])
        out = _optimize(g, init)
        np.testing.assert_allclose(np.asarray(out.at(0)), np.asarray(iRc),
                                   atol=1e-5)

    def test_directions(self):
        iRc = so3.expmap(jnp.asarray([0.1, 0.2, -0.1]))
        zs = np.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        ps = np.asarray(jax.vmap(lambda z: so3.rotate(iRc, z))(jnp.asarray(zs)))
        g = gt.FactorGraph()
        g.add(extras.rotate_directions_factors([0, 0, 0], ps, zs,
                                               gt.noise.isotropic(2, 0.01)))
        init = gt.Values.from_entries(
            [(0, "SO3", so3.expmap(jnp.asarray([0.05, 0.15, -0.05])))])
        out = _optimize(g, init)
        np.testing.assert_allclose(np.asarray(out.at(0)), np.asarray(iRc),
                                   atol=1e-5)


class TestReferenceFrame:
    def test_point_transform_recovery(self):
        """Recover the frame transform from global/local point pairs."""
        T = se3.expmap(jnp.asarray([0.1, 0.2, -0.1, 1.0, -2.0, 0.5]))
        gpts = rng.uniform(-3, 3, size=(6, 3))
        lpts = np.asarray(jax.vmap(lambda p: se3.transform_from(T, p))(
            jnp.asarray(gpts)))
        g = gt.FactorGraph()
        tkey = gt.symbol("t", 0)
        gkeys = [gt.symbol("g", i) for i in range(6)]
        lkeys = [gt.symbol("l", i) for i in range(6)]
        g.add(extras.reference_frame_point_factors(
            gkeys, [tkey] * 6, lkeys, gt.noise.isotropic(3, 0.01)))
        g.add(gt.prior_factors("Point3", gkeys, gpts, gt.noise.isotropic(3, 1e-4)))
        g.add(gt.prior_factors("Point3", lkeys, lpts, gt.noise.isotropic(3, 1e-4)))
        entries = [(tkey, "SE3", se3.identity())]
        entries += [(k, "Point3", jnp.asarray(p)) for k, p in zip(gkeys, gpts)]
        entries += [(k, "Point3", jnp.asarray(p)) for k, p in zip(lkeys, lpts)]
        out = _optimize(g, gt.Values.from_entries(entries))
        np.testing.assert_allclose(np.asarray(se3.logmap(out.at(tkey))),
                                   np.asarray(se3.logmap(T)), atol=1e-3)


class TestFrobenius:
    def test_between_zero_at_truth(self):
        R1 = so3.expmap(jnp.asarray([0.1, 0.0, 0.2]))
        R12 = so3.expmap(jnp.asarray([0.0, 0.3, -0.1]))
        R2 = so3.compose(R1, R12)
        b = extras.frobenius_between_factors([0], [1], R12[None])
        vals = gt.Values.from_entries([(0, "SO3", R1), (1, "SO3", R2)])
        g = gt.FactorGraph().add(b)
        assert float(g.error(vals)) < 1e-12


class TestBetweenEM:
    def test_inlier_outlier_separation(self):
        """Outlier loop closure gets ~zero posterior inlier weight."""
        xs = [se3.expmap(jnp.asarray([0, 0, 0, float(i), 0, 0])) for i in range(3)]
        delta = se3.between(xs[0], xs[1])
        good = se3.stack([delta, se3.between(xs[1], xs[2])])
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE3", [0], se3.stack([xs[0]]),
                               gt.noise.isotropic(6, 1e-3)))
        g.add(gt.between_factors("SE3", [0, 1], [1, 2], good,
                                 gt.noise.isotropic(6, 0.01)))
        # EM factor: one true between + one gross outlier
        meas = se3.stack([se3.between(xs[0], xs[2]),
                          se3.expmap(jnp.asarray([1.0, 1.0, 1.0, 5.0, 5.0, 5.0]))])
        g.add(extras.between_factors_em(
            "SE3", [0, 0], [2, 2], meas,
            sigmas_inlier=np.full(6, 0.05), sigmas_outlier=np.full(6, 50.0)))
        init = gt.Values.from_entries(
            [(i, "SE3", xs[i]) for i in range(3)])
        out = _optimize(g, init)
        # outlier must not drag x2 away
        np.testing.assert_allclose(np.asarray(out.at(2).t),
                                   np.asarray(xs[2].t), atol=0.02)


class TestTOA:
    def test_localize_event(self):
        truth = np.asarray([0.05, 1.0, 2.0, 0.5])  # (t, x, y, z)
        sensors = np.asarray([[0, 0, 0], [10, 0, 0], [0, 10, 0],
                              [0, 0, 10], [10, 10, 0]], dtype=float)
        toas = truth[0] + np.linalg.norm(sensors - truth[1:], axis=1) / 330.0
        g = gt.FactorGraph()
        g.add(extras.toa_factors([0] * 5, sensors, toas,
                                 gt.noise.isotropic(1, 1e-4)))
        # start away from all sensors (‖·‖ is non-differentiable at a sensor)
        init = gt.Values.from_entries([(0, "Vec4", jnp.asarray([0.0, 4.0, 4.0, 4.0]))])
        out = _optimize(g, init, iters=60)
        np.testing.assert_allclose(np.asarray(out.at(0)), truth, atol=1e-3)


class TestInverseDepth:
    def test_zero_at_truth_and_recovery(self):
        K = np.asarray([500.0, 500.0, 0.0, 320.0, 240.0])
        pose = se3.identity()
        lm = jnp.asarray([0.0, 0.0, 0.0, 0.3, 0.2, 0.25])  # anchor + (θ,φ,ρ)
        pt = extras.inv_depth_point(lm)
        from gtsam_tpu.geometry.cameras import project_point, uncalibrate_cal3s2
        uv, _ = project_point(pose, jnp.asarray(K), pt, uncalibrate_cal3s2)
        batch = extras.inv_depth_factors([0], [1], np.asarray(uv)[None], K,
                                         gt.noise.isotropic(2, 1.0))
        vals = gt.Values.from_entries([(0, "SE3", pose), (1, "Vec6", lm)])
        g = gt.FactorGraph().add(batch)
        assert float(g.error(vals)) < 1e-10


class TestRollingShutter:
    def test_interp_projection(self):
        K = np.asarray([500.0, 500.0, 0.0, 320.0, 240.0])
        Ta = se3.identity()
        Tb = se3.expmap(jnp.asarray([0.0, 0.05, 0.0, 0.5, 0.0, 0.0]))
        pt = jnp.asarray([0.3, -0.2, 4.0])
        alpha = 0.4
        Ti = extras.se3_interpolate(Ta, Tb, alpha)
        from gtsam_tpu.geometry.cameras import project_point, uncalibrate_cal3s2
        uv, _ = project_point(Ti, jnp.asarray(K), pt, uncalibrate_cal3s2)
        batch = extras.rolling_shutter_projection_factors(
            [0], [1], [2], np.asarray(uv)[None], [alpha], K,
            gt.noise.isotropic(2, 1.0))
        vals = gt.Values.from_entries(
            [(0, "SE3", Ta), (1, "SE3", Tb), (2, "Point3", pt)])
        g = gt.FactorGraph().add(batch)
        assert float(g.error(vals)) < 1e-10


class TestDynamics:
    def test_velocity_constraint(self):
        s0 = NavState(jnp.eye(3), jnp.zeros(3), jnp.asarray([1.0, 0, 0]))
        s1 = NavState(jnp.eye(3), jnp.asarray([1.0, 0, 0]), jnp.asarray([1.0, 0, 0]))
        b = extras.velocity_constraint_factors([0], [1], [1.0],
                                               gt.noise.isotropic(3, 0.01))
        vals = gt.Values.from_entries([(0, "NavState", s0), (1, "NavState", s1)])
        g = gt.FactorGraph().add(b)
        assert float(g.error(vals)) < 1e-12


class TestWhiteNoise:
    def test_mle_recovery(self):
        z = rng.normal(2.0, 0.5, size=200)
        g = gt.FactorGraph()
        g.add(extras.white_noise_factors([0] * 200, [1] * 200, z))
        init = gt.Values.from_entries([(0, "Scalar", jnp.asarray(0.0)),
                                       (1, "Scalar", jnp.asarray(0.0))])
        res = gt.levenberg_marquardt(g, init, gt.LMParams(
            max_iterations=200, relative_error_tol=1e-10,
            absolute_error_tol=1e-10))
        out = res.values
        assert abs(float(out.at(0)) - z.mean()) < 1e-2
        tau = float(np.exp(out.at(1)))
        np.testing.assert_allclose(tau, 1.0 / z.var(), rtol=0.05)


class TestAHRS:
    def test_preintegrated_rotation_and_factor(self):
        """Constant-rate gyro: ΔR == Exp(ω T); AHRS factor zero at truth,
        Jacobians healthy enough to optimize Rj."""
        w_true = np.asarray([0.3, -0.2, 0.1])
        bias = np.asarray([0.01, -0.02, 0.005])
        T, n = 1.0, 100
        dts = np.full(n, T / n)
        gyros = np.tile(w_true + bias, (n, 1))
        pim = ahrs.preintegrate_rotation(gyros, dts, bias, gyro_sigma=1e-3)
        np.testing.assert_allclose(np.asarray(pim.deltaR),
                                   np.asarray(so3.expmap(jnp.asarray(w_true * T))),
                                   atol=1e-9)
        Ri = so3.expmap(jnp.asarray([0.05, 0.1, -0.2]))
        Rj = Ri @ pim.deltaR
        batch = ahrs.ahrs_factors([0], [1], [2], [pim])
        vals = gt.Values.from_entries(
            [(0, "SO3", Ri), (1, "SO3", Rj), (2, "Vec3", jnp.asarray(bias))])
        g = gt.FactorGraph().add(batch)
        assert float(g.error(vals)) < 1e-9

        # recover Rj from a perturbed start
        g2 = gt.FactorGraph().add(batch)
        g2.add(gt.prior_factors("SO3", [0], Ri[None], gt.noise.isotropic(3, 1e-5)))
        g2.add(gt.prior_factors("Vec3", [2], bias[None], gt.noise.isotropic(3, 1e-5)))
        init = gt.Values.from_entries(
            [(0, "SO3", Ri), (1, "SO3", so3.retract(Rj, jnp.asarray([0.1, -0.1, 0.1]))),
             (2, "Vec3", jnp.asarray(bias))])
        out = _optimize(g2, init)
        np.testing.assert_allclose(np.asarray(out.at(1)), np.asarray(Rj), atol=1e-5)

    def test_bias_jacobian(self):
        """H_bias matches finite differences of Log(ΔR(b))."""
        w = rng.normal(size=(50, 3)) * 0.4
        dts = np.full(50, 0.01)
        b0 = np.asarray([0.02, -0.01, 0.03])
        pim = ahrs.preintegrate_rotation(w, dts, b0, 1e-3)

        def logdelta(b):
            p = ahrs.preintegrate_rotation(w, dts, b, 1e-3)
            return so3.logmap(so3.between(pim.deltaR, p.deltaR))

        eps = 1e-6
        num = np.stack([
            np.asarray(logdelta(b0 + eps * np.eye(3)[i])) / eps
            for i in range(3)], axis=1)
        np.testing.assert_allclose(np.asarray(pim.H_bias), num, atol=1e-4)


class TestManifoldPreintegration:
    def test_matches_tangent_backend(self):
        """Both backends agree on ΔXij for a generic stream (they coincide as
        dt→0; at 100 Hz they should be close) and exactly for rotation."""
        n = 200
        accs = rng.normal(size=(n, 3)) * 2.0 + np.asarray([0, 0, 9.0])
        gyros = rng.normal(size=(n, 3)) * 0.3
        dts = np.full(n, 0.005)
        bias = np.zeros(6)
        params = pre.PreintegrationParams()
        p_t = pre.preintegrate(accs, gyros, dts, bias, params)
        p_m = pre.preintegrate_manifold(accs, gyros, dts, bias, params)
        np.testing.assert_allclose(np.asarray(p_m.zeta[:3]),
                                   np.asarray(p_t.zeta[:3]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(p_m.zeta[3:]),
                                   np.asarray(p_t.zeta[3:]), atol=2e-2)
        # covariance PSD and same order of magnitude
        ev_m = np.linalg.eigvalsh(np.asarray(p_m.cov))
        assert ev_m.min() >= -1e-12
        rel = np.abs(np.asarray(p_m.cov) - np.asarray(p_t.cov)).max()
        assert rel < 0.1 * max(1e-12, np.abs(np.asarray(p_t.cov)).max()) + 1e-6


class TestMagPose:
    def test_zero_at_truth(self):
        d = np.asarray([0.4924, 0.062, -0.868])
        scale, bias = 30.0, np.asarray([1.0, -2.0, 3.0])
        T = se3.expmap(jnp.asarray([0.1, 0.3, -0.2, 1.0, 2.0, 3.0]))
        meas = scale * np.asarray(so3.unrotate(T.R, jnp.asarray(d / np.linalg.norm(d)))) + bias
        b = aiding.mag_pose_factors([0], meas[None], scale, d, bias,
                                    gt.noise.isotropic(3, 0.1))
        vals = gt.Values.from_entries([(0, "SE3", T)])
        g = gt.FactorGraph().add(b)
        assert float(g.error(vals)) < 1e-12
