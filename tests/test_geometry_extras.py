"""Sim3, distortion calibrations, samplers, labeled symbols."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_tpu.base import sampling
from gtsam_tpu.base.keys import (labeled_symbol, labeled_symbol_chr,
                                 labeled_symbol_index, labeled_symbol_label)
from gtsam_tpu.base import noise as noise_mod
from gtsam_tpu.geometry import calibrations as cal
from gtsam_tpu.geometry import sim3, so3

rng = np.random.default_rng(13)


class TestSim3:
    def rand(self):
        return sim3.Sim3(
            jnp.asarray(np.asarray(so3.expmap(jnp.asarray(rng.normal(size=3))))),
            jnp.asarray(rng.normal(size=3)),
            jnp.exp(jnp.asarray(rng.normal() * 0.3)))

    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(rng.normal(size=7) * 0.5)
        T = sim3.expmap(xi)
        np.testing.assert_allclose(np.asarray(sim3.logmap(T)), np.asarray(xi),
                                   atol=1e-8)

    def test_compose_inverse(self):
        T = self.rand()
        I = sim3.compose(T, sim3.inverse(T))
        np.testing.assert_allclose(np.asarray(I.R), np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-12)
        np.testing.assert_allclose(float(I.s), 1.0, atol=1e-12)

    def test_retract_local(self):
        T1, T2 = self.rand(), self.rand()
        d = sim3.local(T1, T2)
        T2b = sim3.retract(T1, d)
        np.testing.assert_allclose(np.asarray(T2b.R), np.asarray(T2.R), atol=1e-8)
        np.testing.assert_allclose(np.asarray(T2b.t), np.asarray(T2.t), atol=1e-7)
        np.testing.assert_allclose(float(T2b.s), float(T2.s), atol=1e-9)

    def test_action_scale(self):
        T = sim3.Sim3(jnp.eye(3), jnp.zeros(3), jnp.asarray(2.0))
        p = jnp.asarray([1.0, 0, 0])
        np.testing.assert_allclose(np.asarray(sim3.transform_from(T, p)),
                                   [2.0, 0, 0])


class TestCalibrations:
    def test_ds2_roundtrip(self):
        K = jnp.asarray([450.0, 460.0, 0.1, 320.0, 240.0,
                         -0.2, 0.05, 1e-3, -2e-3])
        p = jnp.asarray(rng.uniform(-0.4, 0.4, size=(20, 2)))
        pix = cal.uncalibrate_ds2(K, p)
        back = cal.calibrate_ds2(K, pix)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-8)

    def test_fisheye_roundtrip(self):
        K = jnp.asarray([400.0, 400.0, 0.0, 320.0, 240.0,
                         -0.01, 0.005, -0.002, 0.0005])
        p = jnp.asarray(rng.uniform(-0.6, 0.6, size=(20, 2)))
        pix = cal.uncalibrate_fisheye(K, p)
        back = cal.calibrate_fisheye(K, pix)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-7)

    def test_unified_roundtrip(self):
        # reference fixture values (testCal3Unified.cpp uses xi ~ 0.93)
        K = jnp.asarray([380.0, 380.0, 0.2, 320.0, 240.0,
                         -0.1, 0.02, 1e-3, -5e-4, 0.9])
        p = jnp.asarray(rng.uniform(-0.3, 0.3, size=(20, 2)))
        pix = cal.uncalibrate_unified(K, p)
        back = cal.calibrate_unified(K, pix, iterations=25)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-6)

    def test_unified_xi_zero_matches_ds2(self):
        K9 = jnp.asarray([450.0, 460.0, 0.1, 320.0, 240.0,
                          -0.2, 0.05, 1e-3, -2e-3])
        K10 = jnp.concatenate([K9, jnp.zeros(1)])
        p = jnp.asarray(rng.uniform(-0.4, 0.4, size=(8, 2)))
        np.testing.assert_allclose(np.asarray(cal.uncalibrate_unified(K10, p)),
                                   np.asarray(cal.uncalibrate_ds2(K9, p)),
                                   atol=1e-10)

    def test_s2stereo_roundtrip(self):
        K = jnp.asarray([500.0, 500.0, 0.0, 320.0, 240.0, 0.12])
        p = jnp.asarray(rng.uniform(-0.5, 0.5, size=(10, 2)))
        pix = cal.uncalibrate_s2stereo(K, p)
        back = cal.calibrate_s2stereo(K, pix)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-10)


class TestSphericalCamera:
    def test_project_backproject(self):
        from gtsam_tpu.geometry import cameras, se3
        from gtsam_tpu.geometry.se3 import SE3

        pose = se3.expmap(jnp.asarray(rng.normal(size=6) * 0.3))
        pt = jnp.asarray(rng.normal(size=3) * 2.0 + jnp.asarray([0, 0, 5.0]))
        bearing, valid = cameras.spherical_project(pose, pt)
        assert bool(valid)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(bearing)), 1.0,
                                   atol=1e-12)
        depth = jnp.linalg.norm(se3.transform_to(pose, pt))
        back = cameras.spherical_backproject(pose, bearing, depth)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pt), atol=1e-9)

    def test_reprojection_error_zero_at_truth(self):
        from gtsam_tpu.geometry import cameras, se3

        pose = se3.identity()
        pt = jnp.asarray([1.0, -2.0, 4.0])
        bearing, _ = cameras.spherical_project(pose, pt)
        err, valid = cameras.spherical_reprojection_error(pose, pt, bearing)
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-12)

    def test_behind_camera_is_valid(self):
        # spheres see backwards — unlike pinhole there is no cheirality
        from gtsam_tpu.geometry import cameras, se3

        bearing, valid = cameras.spherical_project(se3.identity(),
                                                   jnp.asarray([0.0, 0, -3.0]))
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(bearing), [0, 0, -1.0],
                                   atol=1e-12)


class TestSampling:
    def test_diagonal_sampler_covariance(self):
        model = noise_mod.sigmas(np.array([0.5, 2.0]))
        key = jax.random.PRNGKey(0)
        s = np.asarray(sampling.sample_noise(model, key, 20000))
        np.testing.assert_allclose(s.std(axis=0), [0.5, 2.0], rtol=0.05)

    def test_weighted_sampling(self):
        w = np.array([100.0, 1.0, 1.0, 1.0])
        counts = np.zeros(4)
        for seed in range(200):
            idx = sampling.weighted_sample_without_replacement(
                np.random.default_rng(seed), w, 1)
            counts[idx[0]] += 1
        assert counts[0] > 150  # heavy weight dominates


class TestLabeledSymbol:
    def test_pack_unpack(self):
        k = labeled_symbol("x", "B", 123)
        assert labeled_symbol_chr(k) == "x"
        assert labeled_symbol_label(k) == "B"
        assert labeled_symbol_index(k) == 123


class TestPlanesLines:
    @pytest.mark.slow
    def test_plane_roundtrip_and_estimation(self):
        from gtsam_tpu.geometry import planes_lines as pl, so3 as _so3
        from gtsam_tpu.geometry.se3 import SE3
        import gtsam_tpu as gt
        p = pl.OrientedPlane3(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(2.0))
        xi = jnp.asarray([0.1, -0.2, 0.3])
        np.testing.assert_allclose(
            np.asarray(pl.plane_local(p, pl.plane_retract(p, xi))),
            np.asarray(xi), atol=1e-12)
        true_plane = pl.OrientedPlane3(jnp.asarray([0.0, 0.0, 1.0]),
                                       jnp.asarray(-1.5))
        poses, mn, md = [], [], []
        for i in range(5):
            T = SE3(jnp.asarray(np.asarray(_so3.expmap(
                jnp.asarray(rng.normal(scale=0.3, size=3))))),
                jnp.asarray(rng.normal(size=3)))
            loc = pl.plane_transform(true_plane, T)
            poses.append((i, T))
            mn.append(np.asarray(loc.normal))
            md.append(float(loc.d))
        g = gt.FactorGraph()
        for i, T in poses:
            g.add(gt.prior_factors("SE3", [i], SE3(T.R[None], T.t[None]),
                                   gt.noise.sigmas([[1e-5] * 6])))
        g.add(pl.oriented_plane3_factors(
            [i for i, _ in poses], [gt.symbol("p", 0)] * 5,
            (jnp.asarray(np.stack(mn)), jnp.asarray(md)),
            gt.noise.isotropic(3, 0.01)))
        entries = [(i, "SE3", T) for i, T in poses]
        entries.append((gt.symbol("p", 0), "OrientedPlane3",
                        pl.OrientedPlane3(jnp.asarray([0.1, 0.1, 0.99]),
                                          jnp.asarray(-1.0))))
        res = gt.levenberg_marquardt(g, gt.Values.from_entries(entries))
        est = res.values.at(gt.symbol("p", 0))
        np.testing.assert_allclose(float(est.d), -1.5, atol=1e-6)

    def test_line_roundtrip(self):
        from gtsam_tpu.geometry import planes_lines as pl, so3 as _so3
        l = pl.Line3(jnp.asarray(np.asarray(_so3.expmap(jnp.asarray([0.2, 0.1, -0.3])))),
                     jnp.asarray(0.5), jnp.asarray(-0.2))
        xi = jnp.asarray([0.05, -0.1, 0.2, 0.3])
        l2 = pl.line_retract(l, xi)
        np.testing.assert_allclose(np.asarray(pl.line_local(l, l2)),
                                   np.asarray(xi), atol=1e-12)
