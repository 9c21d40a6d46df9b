"""Smart projection factor tests (testSmartProjectionPoseFactor idioms)."""

import jax.numpy as jnp
import numpy as np
import pytest

import gtsam_tpu as gt
from gtsam_tpu.geometry import so3
from gtsam_tpu.geometry.cameras import uncalibrate_cal3s2
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.slam.smart import smart_projection_factors

rng = np.random.default_rng(4)
K = np.array([500.0, 500.0, 0.0, 320.0, 240.0])


def make_scene(n_poses=5, n_lm=25, pix_noise=0.5):
    poses_t = np.stack([np.array([i * 0.5, 0, 0]) for i in range(n_poses)])
    poses_R = np.stack([np.eye(3)] * n_poses)
    lms = rng.uniform([-2, -2, 4], [4, 2, 8], size=(n_lm, 3))
    uv = np.zeros((n_lm, n_poses, 2))
    for j in range(n_lm):
        for i in range(n_poses):
            pc = poses_R[i].T @ (lms[j] - poses_t[i])
            pn = pc[:2] / pc[2]
            uv[j, i] = np.asarray(uncalibrate_cal3s2(jnp.asarray(K),
                                                     jnp.asarray(pn)))
    uv += rng.normal(scale=pix_noise, size=uv.shape)
    mask = np.ones((n_lm, n_poses), bool)
    keys = np.tile(np.arange(n_poses), (n_lm, 1))
    return poses_R, poses_t, lms, keys, uv, mask


class TestSmartFactors:
    def test_pose_recovery(self):
        poses_R, poses_t, lms, keys, uv, mask = make_scene()
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE3", [0], SE3(poses_R[:1], poses_t[:1]),
                               gt.noise.sigmas([[1e-4] * 6])))
        g.add(gt.prior_factors("SE3", [1], SE3(poses_R[1:2], poses_t[1:2]),
                               gt.noise.sigmas([[10, 10, 10, 0.01, 10, 10]])))
        g.add(smart_projection_factors(keys, uv, mask, K, pixel_sigma=0.5))
        entries = []
        for i in range(5):
            dR = np.asarray(so3.expmap(jnp.asarray(rng.normal(scale=0.02, size=3))))
            entries.append((i, "SE3", SE3(
                jnp.asarray(poses_R[i] @ dR),
                jnp.asarray(poses_t[i] + rng.normal(scale=0.05, size=3)))))
        init = gt.Values.from_entries(entries)
        res = gt.levenberg_marquardt(g, init, gt.LMParams(max_iterations=30))
        est_t = np.asarray(res.values.arrays["SE3"].t)
        assert np.abs(est_t - poses_t).max() < 0.05

    def test_masked_observations(self):
        """Tracks with partial visibility (padded rows) still work."""
        poses_R, poses_t, lms, keys, uv, mask = make_scene(n_lm=15)
        mask[:, -1] = False  # last camera sees nothing
        mask[0, 2] = False
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE3", [0, 1],
                               SE3(poses_R[:2], poses_t[:2]),
                               gt.noise.sigmas([[1e-4] * 6] * 2)))
        g.add(smart_projection_factors(keys, uv, mask, K, pixel_sigma=0.5))
        entries = [(i, "SE3", SE3(jnp.asarray(poses_R[i]),
                                  jnp.asarray(poses_t[i]
                                              + rng.normal(scale=0.03, size=3))))
                   for i in range(5)]
        init = gt.Values.from_entries(entries)
        res = gt.levenberg_marquardt(g, init, gt.LMParams(max_iterations=20))
        est_t = np.asarray(res.values.arrays["SE3"].t)
        # cameras 0..3 constrained by observations; camera 4 only weakly —
        # check the observed ones
        assert np.abs(est_t[:4] - poses_t[:4]).max() < 0.05

    @pytest.mark.slow

    def test_degenerate_track_zeroed(self):
        """A track seen by a single camera (after masking) must not blow up."""
        poses_R, poses_t, lms, keys, uv, mask = make_scene(n_lm=8)
        mask[3, 1:] = False  # track 3: single observation -> degenerate
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE3", [0, 1],
                               SE3(poses_R[:2], poses_t[:2]),
                               gt.noise.sigmas([[1e-4] * 6] * 2)))
        g.add(smart_projection_factors(keys, uv, mask, K))
        entries = [(i, "SE3", SE3(jnp.asarray(poses_R[i]), jnp.asarray(poses_t[i])))
                   for i in range(5)]
        init = gt.Values.from_entries(entries)
        err = float(g.error(init))
        assert np.isfinite(err)
        res = gt.gauss_newton(g, init, gt.OptimizerParams(max_iterations=5))
        assert np.isfinite(res.error)


class TestSmartStereo:
    @pytest.mark.slow
    def test_stereo_pose_recovery(self):
        """Recover a perturbed middle pose from structureless stereo tracks
        (SmartStereoProjectionPoseFactor analog)."""
        from gtsam_tpu.geometry.cameras import stereo_project
        from gtsam_tpu.slam.smart import smart_stereo_factors
        baseline = 0.2
        n_poses, n_lm = 4, 30
        poses_t = np.stack([np.array([i * 0.4, 0, 0]) for i in range(n_poses)])
        poses_R = np.stack([np.eye(3)] * n_poses)
        lms = rng.uniform([-2, -2, 4], [3, 2, 8], size=(n_lm, 3))
        uvw = np.zeros((n_lm, n_poses, 3))
        for j in range(n_lm):
            z, ok = stereo_project(
                SE3(jnp.asarray(poses_R), jnp.asarray(poses_t)),
                jnp.asarray(K), baseline, jnp.asarray(lms[j])[None].repeat(n_poses, 0))
            assert bool(jnp.all(ok))
            uvw[j] = np.asarray(z)
        uvw += rng.normal(scale=0.3, size=uvw.shape)
        mask = np.ones((n_lm, n_poses), bool)
        keys = np.tile(np.arange(n_poses), (n_lm, 1))

        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE3", [0], SE3(poses_R[:1], poses_t[:1]),
                               gt.noise.sigmas([[1e-4] * 6])))
        g.add(gt.prior_factors("SE3", [n_poses - 1],
                               SE3(poses_R[-1:], poses_t[-1:]),
                               gt.noise.sigmas([[1e-4] * 6])))
        g.add(smart_stereo_factors(keys, uvw, mask, K, baseline,
                                   pixel_sigma=0.3))
        entries = []
        for i in range(n_poses):
            t = poses_t[i] + (rng.normal(scale=0.05, size=3)
                              if 0 < i < n_poses - 1 else 0.0)
            entries.append((i, "SE3", SE3(jnp.asarray(poses_R[i]),
                                          jnp.asarray(t))))
        res = gt.levenberg_marquardt(g, gt.Values.from_entries(entries),
                                     gt.LMParams(max_iterations=25))
        for i in range(n_poses):
            np.testing.assert_allclose(np.asarray(res.values.at(i).t),
                                       poses_t[i], atol=2e-2)


class TestLinearizationModes:
    """Mode parity: JACOBIAN_Q == JACOBIAN_SVD == HESSIAN information
    (testSmartProjectionPoseFactor.cpp's mode-equivalence checks)."""

    def _values(self, poses_R, poses_t, jitter=0.03):
        entries = []
        for i in range(len(poses_t)):
            dR = np.asarray(so3.expmap(jnp.asarray(
                rng.normal(scale=jitter, size=3))))
            entries.append((i, "SE3", SE3(
                jnp.asarray(poses_R[i] @ dR),
                jnp.asarray(poses_t[i] + rng.normal(scale=jitter, size=3)))))
        return gt.Values.from_entries(entries)

    @pytest.mark.slow

    def test_q_vs_svd_information(self):
        poses_R, poses_t, lms, keys, uv, mask = make_scene(n_lm=8)
        vals = self._values(poses_R, poses_t)
        bq = smart_projection_factors(keys, uv, mask, K, mode="JACOBIAN_Q")
        bs = smart_projection_factors(keys, uv, mask, K, mode="JACOBIAN_SVD")
        gq = gt.FactorGraph([bq]).bind(vals)
        gs = gt.FactorGraph([bs]).bind(vals)
        Hq, gvq = gq.gn_system(vals.arrays)
        Hs, gvs = gs.gn_system(vals.arrays)
        np.testing.assert_allclose(np.asarray(Hq), np.asarray(Hs),
                                   atol=1e-5 * np.abs(np.asarray(Hq)).max())
        np.testing.assert_allclose(np.asarray(gvq), np.asarray(gvs),
                                   atol=1e-5 * np.abs(np.asarray(gvq)).max())

    @pytest.mark.slow
    def test_hessian_mode_information(self):
        from gtsam_tpu.slam.smart import (accumulate_hessian,
                                          smart_hessian_blocks)
        poses_R, poses_t, lms, keys, uv, mask = make_scene(n_lm=8)
        vals = self._values(poses_R, poses_t)
        bq = smart_projection_factors(keys, uv, mask, K, mode="JACOBIAN_Q")
        Hq, gvq = gt.FactorGraph([bq]).bind(vals).gn_system(vals.arrays)
        G, gg, kk = smart_hessian_blocks(bq, vals)
        D = Hq.shape[0]
        H0 = jnp.zeros((D, D))
        g0 = jnp.zeros(D)
        Hh, gh = accumulate_hessian(H0, g0, G, gg, kk, vals)
        np.testing.assert_allclose(np.asarray(Hh), np.asarray(Hq),
                                   atol=1e-5 * np.abs(np.asarray(Hq)).max())
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gvq),
                                   atol=1e-5 * max(np.abs(np.asarray(gvq)).max(), 1.0))

    def test_per_camera_calibration_rig(self):
        """Rig mode: two physical cameras with different K and extrinsics."""
        poses_R, poses_t, lms, keys, uv, mask = make_scene(n_lm=12)
        n_lm, n_poses = uv.shape[0], uv.shape[1]
        Ks = np.stack([K, K * np.array([1.2, 1.2, 1.0, 1.0, 1.0])])
        cam_ids = np.tile(np.arange(n_poses) % 2, (n_lm, 1)).astype(np.int32)
        # re-render measurements with per-camera K (identity extrinsics)
        for j in range(n_lm):
            for i in range(n_poses):
                pc = poses_R[i].T @ (lms[j] - poses_t[i])
                pn = pc[:2] / pc[2]
                uv[j, i] = np.asarray(uncalibrate_cal3s2(
                    jnp.asarray(Ks[cam_ids[j, i]]), jnp.asarray(pn)))
        rig = SE3(jnp.stack([jnp.eye(3)] * 2), jnp.zeros((2, 3)))
        b = smart_projection_factors(keys, uv, mask, Ks, pixel_sigma=0.5,
                                     body_P_sensor=rig, cam_ids=cam_ids)
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE3", [0], SE3(poses_R[:1], poses_t[:1]),
                               gt.noise.sigmas([[1e-4] * 6])))
        g.add(gt.prior_factors("SE3", [1], SE3(poses_R[1:2], poses_t[1:2]),
                               gt.noise.sigmas([[10, 10, 10, 0.01, 10, 10]])))
        g.add(b)
        init = self._values(poses_R, poses_t, jitter=0.02)
        res = gt.levenberg_marquardt(g, init, gt.LMParams(max_iterations=25))
        est_t = np.asarray(res.values.arrays["SE3"].t)
        assert np.abs(est_t - poses_t).max() < 0.05

    @pytest.mark.slow

    def test_implicit_schur_pcg_matches_dense(self):
        """IMPLICIT_SCHUR semantics: PCG's matrix-free matvec on a smart batch
        reaches the same GN step as the dense solve (never forms H)."""
        from gtsam_tpu.linear.pcg import PCGSolver
        poses_R, poses_t, lms, keys, uv, mask = make_scene(n_lm=10)
        vals = self._values(poses_R, poses_t)
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE3", [0], SE3(poses_R[:1], poses_t[:1]),
                               gt.noise.sigmas([[1e-3] * 6])))
        g.add(gt.prior_factors("SE3", [1], SE3(poses_R[1:2], poses_t[1:2]),
                               gt.noise.sigmas([[10, 10, 10, 0.01, 10, 10]])))
        g.add(smart_projection_factors(keys, uv, mask, K,
                                       mode="IMPLICIT_SCHUR"))
        bound = g.bind(vals)
        H, gv = bound.gn_system(vals.arrays)
        lam = 1e-6
        dense_delta = np.linalg.solve(
            np.asarray(H) + lam * np.eye(H.shape[0]), np.asarray(gv))
        solver = PCGSolver(max_iterations=400, tol=1e-12)
        s = solver.bind(bound)
        sys_ = s.system(vals.arrays)
        delta = s.solve(sys_, lam, False)
        np.testing.assert_allclose(np.asarray(delta), dense_delta,
                                   atol=1e-5 * max(1.0, np.abs(dense_delta).max()))
