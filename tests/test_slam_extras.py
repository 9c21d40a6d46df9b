"""Tests: stereo/projection/essential factors, DSF tracks, translation
averaging + MFAS, attitude/mag factors, Karcher mean, Unit3."""

import jax.numpy as jnp
import numpy as np
import pytest

import gtsam_tpu as gt
from gtsam_tpu.base.dsf import DSF, DSFMap
from gtsam_tpu.geometry import se3, so3, unit3
from gtsam_tpu.geometry.cameras import uncalibrate_cal3s2
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.navigation import aiding
from gtsam_tpu.sfm import tracks as tracks_mod
from gtsam_tpu.sfm import translation as trans_mod
from gtsam_tpu.slam import factors as slam_factors

rng = np.random.default_rng(9)
K = np.array([500.0, 500.0, 0.0, 320.0, 240.0])


class TestProjectionFactors:
    def test_stereo_localization(self):
        """Recover a pose from stereo observations of known landmarks."""
        baseline = 0.2
        lms = rng.uniform([-2, -2, 3], [2, 2, 6], size=(12, 3))
        T_true = SE3(jnp.asarray(np.asarray(so3.expmap(jnp.asarray([0.05, -0.02, 0.1])))),
                     jnp.asarray([0.3, -0.1, 0.2]))
        from gtsam_tpu.geometry.cameras import stereo_project
        z, ok = stereo_project(SE3(T_true.R[None].repeat(12, 0),
                                   T_true.t[None].repeat(12, 0)),
                               jnp.asarray(K), baseline, jnp.asarray(lms))
        assert bool(jnp.all(ok))
        g = gt.FactorGraph()
        g.add(slam_factors.stereo_factors([0] * 12,
                                          [gt.symbol("l", i) for i in range(12)],
                                          np.asarray(z), K, baseline,
                                          gt.noise.isotropic(3, 0.5)))
        # landmarks known exactly
        g.add(gt.prior_factors("Point3", [gt.symbol("l", i) for i in range(12)],
                               lms, gt.noise.isotropic(3, 1e-5)))
        entries = [(0, "SE3", SE3(jnp.eye(3), jnp.zeros(3)))]
        entries += [(gt.symbol("l", i), "Point3", lms[i]) for i in range(12)]
        res = gt.levenberg_marquardt(g, gt.Values.from_entries(entries))
        got = res.values.at(0)
        np.testing.assert_allclose(np.asarray(got.t), np.asarray(T_true.t),
                                   atol=1e-4)

    def test_generic_projection(self):
        lms = rng.uniform([-2, -2, 3], [2, 2, 6], size=(15, 3))
        T_true = SE3(jnp.eye(3), jnp.asarray([0.2, 0.1, 0.0]))
        pc = se3.transform_to(SE3(T_true.R[None].repeat(15, 0),
                                  T_true.t[None].repeat(15, 0)), jnp.asarray(lms))
        uv = np.asarray(uncalibrate_cal3s2(jnp.asarray(K), pc[:, :2] / pc[:, 2:3]))
        g = gt.FactorGraph()
        g.add(slam_factors.generic_projection_factors(
            [0] * 15, [gt.symbol("l", i) for i in range(15)], uv, K,
            gt.noise.isotropic(2, 1.0)))
        g.add(gt.prior_factors("Point3", [gt.symbol("l", i) for i in range(15)],
                               lms, gt.noise.isotropic(3, 1e-5)))
        entries = [(0, "SE3", SE3(jnp.eye(3), jnp.zeros(3)))]
        entries += [(gt.symbol("l", i), "Point3", lms[i]) for i in range(15)]
        res = gt.levenberg_marquardt(g, gt.Values.from_entries(entries))
        np.testing.assert_allclose(np.asarray(res.values.at(0).t),
                                   np.asarray(T_true.t), atol=1e-5)

    def test_essential_epipolar_zero_at_truth(self):
        T1 = SE3(jnp.eye(3), jnp.zeros(3))
        T2 = SE3(jnp.asarray(np.asarray(so3.expmap(jnp.asarray([0.0, 0.1, 0.0])))),
                 jnp.asarray([1.0, 0.0, 0.0]))
        pts = rng.uniform([-1, -1, 3], [1, 1, 6], size=(10, 3))
        p1 = pts / pts[:, 2:3]
        pc2 = se3.transform_to(SE3(T2.R[None].repeat(10, 0),
                                   T2.t[None].repeat(10, 0)), jnp.asarray(pts))
        p2 = np.asarray(pc2 / pc2[:, 2:3])
        pairs = np.stack([p1[:, :2], p2[:, :2]], axis=1)
        batch = slam_factors.essential_matrix_factors(
            [0] * 10, [1] * 10, pairs, gt.noise.isotropic(1, 0.01))
        g = gt.FactorGraph([batch])
        vals = gt.Values.from_entries([(0, "SE3", T1), (1, "SE3", T2)])
        assert float(g.error(vals)) < 1e-12


class TestDSF:
    def test_union_find(self):
        d = DSF(6)
        d.union(0, 1)
        d.union(1, 2)
        d.union(4, 5)
        assert d.find(0) == d.find(2)
        assert d.find(3) != d.find(0)
        assert len(d.sets()) == 3

    def test_track_generation(self):
        kp = {0: rng.uniform(0, 640, (5, 2)),
              1: rng.uniform(0, 640, (5, 2)),
              2: rng.uniform(0, 640, (5, 2))}
        matches = {(0, 1): np.array([[0, 0], [1, 1]]),
                   (1, 2): np.array([[0, 0], [3, 3]])}
        tracks = tracks_mod.tracks_from_pairwise_matches(matches, kp)
        lens = sorted(len(t.measurements) for t in tracks)
        assert lens == [2, 2, 3]  # {0-0,1-0,2-0}, {0-1,1-1}, {1-3,2-3}

    def test_inconsistent_track_dropped(self):
        kp = {0: rng.uniform(0, 640, (3, 2)), 1: rng.uniform(0, 640, (3, 2))}
        matches = {(0, 1): np.array([[0, 0], [1, 0]])}  # two features of cam0 -> same
        tracks = tracks_mod.tracks_from_pairwise_matches(matches, kp)
        assert len(tracks) == 0


class TestTranslationAveraging:
    def test_recover_translations(self):
        t_true = {0: np.zeros(3), 1: np.array([1.0, 0, 0]),
                  2: np.array([1.0, 1.0, 0]), 3: np.array([0.0, 1.0, 0.5])}
        edges = []
        for (i, j) in [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3), (0, 3)]:
            d = t_true[j] - t_true[i]
            edges.append((i, j, d / np.linalg.norm(d)))
        got = trans_mod.recover_translations(edges)
        # gauge: anchor 0 at origin, scale from edge (0,1)
        for k in range(4):
            np.testing.assert_allclose(got[k], t_true[k], atol=1e-4)

    def test_mfas_consistent_order(self):
        edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 0.9)]
        order = trans_mod.mfas_ordering(edges, [0, 1, 2])
        assert order == [0, 1, 2]

    def test_mfas_outlier_detection(self):
        # 1D chain along x with one backward (outlier) direction
        edges = [(0, 1, np.array([1.0, 0, 0])), (1, 2, np.array([1.0, 0, 0])),
                 (0, 2, np.array([-1.0, 0, 0]))]  # inconsistent
        w = trans_mod.mfas_outlier_weights(edges, np.array([1.0, 0, 0]))
        assert w[0] == 0.0 and w[1] == 0.0 and w[2] > 0.5


class TestAttitude:
    def test_attitude_recovers_roll_pitch(self):
        R_true = np.asarray(so3.ypr(0.3, 0.2, -0.1))
        nZ = np.array([0.0, 0.0, -1.0])        # gravity direction in nav
        bRef = R_true.T @ nZ                   # what the accelerometer sees
        g = gt.FactorGraph()
        g.add(aiding.rot_attitude_factors([0], nZ[None], bRef[None],
                                          gt.noise.isotropic(2, 0.01)))
        # yaw unconstrained by gravity: add rotation prior to pin it
        g.add(gt.prior_factors("SO3", [0], jnp.asarray(R_true)[None],
                               gt.noise.isotropic(3, 10.0)))
        init = gt.Values.from_entries([(0, "SO3", jnp.eye(3))])
        res = gt.levenberg_marquardt(g, init)
        got = np.asarray(res.values.at(0))
        # the gravity direction must match tightly
        np.testing.assert_allclose(got @ bRef, nZ, atol=1e-4)

    def test_karcher_mean(self):
        base = np.asarray(so3.expmap(jnp.asarray([0.3, -0.2, 0.5])))
        perts = so3.expmap(jnp.asarray(rng.normal(scale=0.05, size=(20, 3))))
        Rs = jnp.asarray(base) @ perts
        mean = slam_factors.karcher_mean_so3(Rs)
        d = float(jnp.linalg.norm(so3.logmap(so3.between(jnp.asarray(base), mean))))
        assert d < 0.03

    def test_unit3_retract_local(self):
        p = jnp.asarray([0.0, 0.0, 1.0])
        xi = jnp.asarray([0.3, -0.2])
        q = unit3.retract(p, xi)
        np.testing.assert_allclose(float(jnp.linalg.norm(q)), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(unit3.local(p, q)), np.asarray(xi),
                                   atol=1e-12)


class TestLagoAndAux:
    @pytest.mark.slow
    def test_lago_w100(self):
        from gtsam_tpu.io import datasets
        from gtsam_tpu.slam.initialize import initialize_pose2_lago
        graph, initial = datasets.load_2d(datasets.find_example_data("w100.graph"))
        graph.add(gt.prior_factors("SE2", [0], np.asarray(initial.at(0))[None],
                                   gt.noise.sigmas([[0.01] * 3])))
        v0 = initialize_pose2_lago(graph)
        # lago must land close to the optimum basin
        assert float(graph.error(v0)) < 1.0
        res = gt.gauss_newton(graph, v0)
        np.testing.assert_allclose(res.error, 0.568927, atol=1e-4)

    def test_checkpoint_roundtrip(self):
        from gtsam_tpu.utils import checkpoint
        from gtsam_tpu.geometry.se3 import SE3
        v = gt.Values.from_entries([
            (1, "SE3", SE3(jnp.eye(3), jnp.asarray([1.0, 2, 3]))),
            (2, "Point3", jnp.asarray([4.0, 5, 6]))])
        checkpoint.save_values("/tmp/ckpt_ut", v, {"it": 7})
        v2, extra = checkpoint.load_values("/tmp/ckpt_ut")
        np.testing.assert_allclose(np.asarray(v2.arrays["SE3"].t),
                                   [[1.0, 2, 3]])
        assert int(extra["it"]) == 7

    def test_combined_imu_consistency(self):
        import jax
        from gtsam_tpu.navigation.preintegration import (
            PreintegrationParams, preintegrate_combined)
        from gtsam_tpu.navigation import factors as nf
        from gtsam_tpu.geometry.se3 import SE3
        from gtsam_tpu.graph import factors as fm
        params = PreintegrationParams(gravity=(0, 0, -9.81))
        n = 50
        accs = np.tile([0, 0, 9.81], (n, 1))
        gyros = np.zeros((n, 3))
        cpim = preintegrate_combined(accs, gyros, np.full(n, 0.01),
                                     np.zeros(6), params)
        assert np.linalg.eigvalsh(np.asarray(cpim.cov15)).min() > 0
        cpims = jax.tree.map(lambda a: a[None], cpim)
        batch = nf.combined_imu_factors([0], [1], [2], [3], [4], [5],
                                        cpims, params)
        xs = (SE3(jnp.eye(3)[None], jnp.zeros((1, 3))), jnp.zeros((1, 3)),
              SE3(jnp.eye(3)[None], jnp.zeros((1, 3))), jnp.zeros((1, 3)),
              jnp.zeros((1, 6)), jnp.zeros((1, 6)))
        r = fm.residuals(batch, xs)
        assert float(jnp.abs(r).max()) < 1e-12
