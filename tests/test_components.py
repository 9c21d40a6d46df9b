"""Marginals, PCG, triangulation, bearing-range (sam) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gtsam_tpu as gt
from gtsam_tpu.geometry import se3, triangulation as tri
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.linear.pcg import PCGSolver
from gtsam_tpu.nonlinear.marginals import Marginals
from gtsam_tpu.sam import factors as sam_factors

from .test_linear import mixed_graph

rng = np.random.default_rng(11)


class TestPCG:
    def test_lm_matches_dense(self):
        g, vals = mixed_graph(n=30, nl=4)
        r_pcg = gt.levenberg_marquardt(g, vals, gt.LMParams(max_iterations=12),
                                       solver=PCGSolver())
        r_dense = gt.levenberg_marquardt(g, vals, gt.LMParams(max_iterations=12))
        np.testing.assert_allclose(r_pcg.error, r_dense.error, rtol=1e-5)


class TestMarginals:
    @pytest.mark.slow
    def test_dense_sparse_agree(self):
        g, vals = mixed_graph(n=25, nl=4)
        res = gt.levenberg_marquardt(g, vals, gt.LMParams(max_iterations=10))
        md = Marginals(g, res.values)
        ms = Marginals(g, res.values, sparse=True)
        for key in [0, 5, gt.symbol("l", 1)]:
            c1 = np.asarray(md.marginal_covariance(key))
            c2 = np.asarray(ms.marginal_covariance(key))
            np.testing.assert_allclose(c1, c2, atol=1e-10)
            # covariance is SPD
            assert np.linalg.eigvalsh(c1).min() > 0

    def test_prior_only_covariance(self):
        """Single variable with one prior: marginal covariance == sigma^2 I."""
        g = gt.FactorGraph()
        g.add(gt.prior_factors("Point3", [7], np.zeros((1, 3)),
                               gt.noise.isotropic(3, 0.5)))
        vals = gt.Values.from_entries([(7, "Point3", np.zeros(3))])
        m = Marginals(g, vals)
        np.testing.assert_allclose(np.asarray(m.marginal_covariance(7)),
                                   0.25 * np.eye(3), atol=1e-12)


class TestTriangulation:
    def _setup(self, noise=0.0):
        pt = jnp.asarray([1.0, 0.5, 4.0])
        poses = SE3(jnp.stack([jnp.eye(3)] * 4),
                    jnp.asarray(rng.normal(scale=1.0, size=(4, 3))
                                * np.array([1, 1, 0.1])))
        pc = se3.transform_to(poses, pt[None].repeat(4, 0))
        meas = pc[:, :2] / pc[:, 2:3]
        if noise:
            meas = meas + rng.normal(scale=noise, size=meas.shape)
        return pt, poses, meas

    def test_dlt_exact(self):
        pt, poses, meas = self._setup()
        res = tri.triangulate_dlt(poses, meas)
        assert bool(res.valid)
        np.testing.assert_allclose(np.asarray(res.point), np.asarray(pt), atol=1e-9)

    def test_safe_with_noise(self):
        pt, poses, meas = self._setup(noise=1e-3)
        res = tri.triangulate_safe(poses, meas)
        assert bool(res.valid)
        assert float(jnp.abs(res.point - pt).max()) < 0.05

    def test_behind_camera_invalid(self):
        poses = SE3(jnp.stack([jnp.eye(3)] * 2),
                    jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]]))
        pt = jnp.asarray([0.5, 0.0, -3.0])  # behind both cameras
        pc = se3.transform_to(poses, pt[None].repeat(2, 0))
        meas = pc[:, :2] / pc[:, 2:3]
        res = tri.triangulate_safe(poses, meas)
        assert not bool(res.valid)

    def test_vmapped_tracks(self):
        """Batch of tracks with per-track masks (smart-factor style)."""
        pts = jnp.asarray(rng.normal(size=(6, 3)) + np.array([0, 0, 5.0]))
        poses = SE3(jnp.stack([jnp.eye(3)] * 4),
                    jnp.asarray(rng.normal(scale=0.5, size=(4, 3))
                                * np.array([1, 1, 0.05])))

        def one(pt):
            pc = se3.transform_to(poses, pt[None].repeat(4, 0))
            meas = pc[:, :2] / pc[:, 2:3]
            return tri.triangulate_safe(poses, meas)

        res = jax.vmap(one)(pts)
        assert bool(jnp.all(res.valid))
        np.testing.assert_allclose(np.asarray(res.point), np.asarray(pts),
                                   atol=1e-6)


class TestSam:
    def test_bearing_range_slam(self):
        """Pose2 + landmarks localization from bearing-range (PlanarSLAM idiom)."""
        true_poses = np.array([[0, 0, 0], [2, 0, 0], [4, 0, 0.3]], dtype=float)
        true_lms = np.array([[1.0, 2.0], [3.0, -1.5]])
        L = gt.shorthand("l")
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE2", [0], true_poses[:1],
                               gt.noise.sigmas([[0.01, 0.01, 0.01]])))
        g.add(gt.between_factors("SE2", [0, 1], [1, 2],
                                 np.array([[2, 0, 0], [2, 0, 0.3]], dtype=float),
                                 gt.noise.sigmas([[0.1, 0.1, 0.05]] * 2)))
        pk, lk, bs, rs = [], [], [], []
        from gtsam_tpu.geometry import se2 as se2m
        for i, p in enumerate(true_poses):
            for j, lm in enumerate(true_lms):
                pk.append(i)
                lk.append(L(j))
                bs.append(float(se2m.bearing(jnp.asarray(p), jnp.asarray(lm))))
                rs.append(float(np.linalg.norm(lm - p[:2])))
        g.add(sam_factors.bearing_range_2d_factors(
            pk, lk, bs, rs, gt.noise.sigmas([[0.01, 0.05]] * len(pk))))
        entries = [(i, "SE2", true_poses[i] + rng.normal(scale=0.1, size=3))
                   for i in range(3)]
        entries += [(L(j), "Point2", true_lms[j] + rng.normal(scale=0.3, size=2))
                    for j in range(2)]
        init = gt.Values.from_entries(entries)
        res = gt.levenberg_marquardt(g, init)
        for j in range(2):
            got = np.asarray(res.values.at(L(j)))
            np.testing.assert_allclose(got, true_lms[j], atol=1e-3)
