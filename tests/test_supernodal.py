"""Supernodal multifrontal solver: parity with dense, damping, failures.

Mirrors the reference idioms: QR-vs-Cholesky cross-checks
(gtsam/linear/tests/testGaussianFactorGraph.cpp) and the
IndeterminantLinearSystemException contract (gtsam/linear/linearExceptions.h,
thrown from JacobianFactor.cpp:838).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import gtsam_tpu as gt
from gtsam_tpu.io import datasets
from gtsam_tpu.linear.exceptions import IndeterminantLinearSystemError
from gtsam_tpu.linear.supernodal import SupernodalCholeskySolver


def _w100_graph(with_prior=True):
    graph, initial = datasets.load_2d(datasets.find_example_data("w100.graph"))
    if with_prior:
        graph.add(gt.prior_factors(
            "SE2", [sorted(initial.keys["SE2"])[0]],
            np.zeros((1, 3)), gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])))
    return graph, initial


class TestSupernodalCholesky:
    @pytest.mark.slow
    def test_matches_dense_solve(self):
        graph, initial = _w100_graph()
        bound = graph.bind(initial)
        arrays = initial.arrays
        sup = SupernodalCholeskySolver(bound)
        H, g = bound.gn_system(arrays)
        for lam in (0.0, 0.01, 10.0):
            ref = jnp.linalg.solve(H + lam * jnp.eye(H.shape[0]), g)
            dx = sup.solve(arrays, lam=lam)
            np.testing.assert_allclose(np.asarray(dx), np.asarray(ref),
                                       atol=1e-8)

    @pytest.mark.slow
    def test_diagonal_damping_matches_dense(self):
        graph, initial = _w100_graph()
        bound = graph.bind(initial)
        arrays = initial.arrays
        sup = SupernodalCholeskySolver(bound)
        H, g = bound.gn_system(arrays)
        lam = 0.5
        Hd = H + lam * jnp.diag(jnp.clip(jnp.diagonal(H), 1e-6, 1e32))
        ref = jnp.linalg.solve(Hd, g)
        blocks, gg = sup.system(arrays)
        dx = sup.solve_factored(
            sup.factorize(blocks, lam, diagonal_damping=True), gg)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(ref), atol=1e-8)

    @pytest.mark.slow
    def test_underconstrained_raises(self):
        graph, initial = _w100_graph(with_prior=False)  # gauge freedom
        bound = graph.bind(initial)
        sup = SupernodalCholeskySolver(bound)
        with pytest.raises(IndeterminantLinearSystemError):
            sup.check_system(initial.arrays, lam=0.0)

    def test_ok_flag_on_good_system(self):
        graph, initial = _w100_graph()
        bound = graph.bind(initial)
        sup = SupernodalCholeskySolver(bound)
        blocks, _ = sup.system(initial.arrays)
        _, _, _, ok, badcol = sup.factorize(blocks, 0.0)
        assert bool(ok)
        assert int(badcol) == -1

    @pytest.mark.slow

    def test_amd_ordering_parity(self):
        graph, initial = _w100_graph()
        bound = graph.bind(initial)
        arrays = initial.arrays
        H, g = bound.gn_system(arrays)
        ref = jnp.linalg.solve(H + 0.01 * jnp.eye(H.shape[0]), g)
        for order in ("amd", "natural"):
            sup = SupernodalCholeskySolver(bound, order=order)
            dx = sup.solve(arrays, lam=0.01)
            np.testing.assert_allclose(np.asarray(dx), np.asarray(ref),
                                       atol=1e-8)

    def test_lm_auto_selects_supernodal(self):
        # >1024-dim system: auto solver must pick the sparse path and land on
        # the same optimum as the dense solver
        graph, initial = datasets.load_2d(
            datasets.find_example_data("w100.graph"))
        graph.add(gt.prior_factors(
            "SE2", [sorted(initial.keys["SE2"])[0]],
            np.zeros((1, 3)), gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])))
        res_sparse = gt.levenberg_marquardt(
            graph, initial, gt.LMParams(max_iterations=10),
            solver=gt.SparseSolver())
        res_dense = gt.levenberg_marquardt(
            graph, initial, gt.LMParams(max_iterations=10))
        assert abs(res_sparse.error - res_dense.error) < 1e-6

    def test_fused_lm_sparse(self):
        graph, initial = _w100_graph()
        res = gt.levenberg_marquardt_fused(
            graph, initial, gt.LMParams(max_iterations=10),
            solver=gt.SparseSolver())
        res_ref = gt.levenberg_marquardt(
            graph, initial, gt.LMParams(max_iterations=10))
        assert abs(res.error - res_ref.error) < 1e-6


class TestTwoFloatRefinement:
    @pytest.mark.slow
    def test_matvec_df_and_refined_solve(self):
        """matvec_df must reproduce the f64 matvec exactly; solve_refined_df
        must reach the same accuracy as the emulated-f64 refinement (the
        TPU-native replacement, round 4)."""
        import gtsam_tpu as gt
        from gtsam_tpu.io import datasets
        from gtsam_tpu import config as cfg
        cfg.set_default_dtype(jnp.float32)
        try:
            graph, initial = datasets.load_2d(
                datasets.find_example_data("w100.graph"))
            graph.add(gt.prior_factors(
                "SE2", [0], np.zeros((1, 3)),
                gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])))
            g32 = graph.astype(jnp.float32)
            vals32 = initial.astype(jnp.float32)
            bound = g32.bind(vals32)
            sup = SupernodalCholeskySolver(bound)
            blocks, g = sup.system(vals32.arrays)
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.normal(size=(sup.nvars, sup.d))
                            .astype(np.float32))
            y64 = sup.matvec(blocks, x.astype(jnp.float64), 1e-4)
            yh, yl = sup.matvec_df(blocks, (x, jnp.zeros_like(x)), 1e-4)
            ydf = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
            scale = np.abs(np.asarray(y64)).max()
            assert np.abs(ydf - np.asarray(y64)).max() < 1e-12 * scale

            lam = 1e-4
            x_df = sup.solve_refined_df(blocks, g, lam, refine_iters=2)
            H, gd = bound.gn_system(vals32.arrays)
            ref = np.linalg.solve(
                np.asarray(H, np.float64) + lam * np.eye(H.shape[0]),
                np.asarray(gd, np.float64))
            err = np.abs(np.asarray(x_df, np.float64) - ref).max()
            assert err < 1e-6 * max(1.0, np.abs(ref).max())
        finally:
            cfg.set_default_dtype(jnp.float64)


class TestSparseQRvsCholesky:
    def test_qr_matches_cholesky_small(self):
        """Fast default-tier QR-vs-Cholesky cross-check (idiom #5) on a
        small random SE2 chain+loop graph; the w100 variant below keeps the
        full-dataset check in the slow tier."""
        import gtsam_tpu as gt
        from gtsam_tpu import config as cfg
        cfg.set_default_dtype(jnp.float32)
        try:
            rng = np.random.default_rng(3)
            n = 14
            ki = np.arange(n - 1)
            kj = ki + 1
            loops_i = np.array([0, 3, 5])
            loops_j = np.array([7, 10, 13])
            i = np.concatenate([ki, loops_i])
            j = np.concatenate([kj, loops_j])
            meas = rng.normal(0, 0.5, (len(i), 3))
            graph = gt.FactorGraph()
            graph.add(gt.between_factors(
                "SE2", i, j, jnp.asarray(meas),
                gt.noise.sigmas(np.full((len(i), 3), 0.1))))
            graph.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                                       gt.noise.sigmas([[1e-2] * 3])))
            vals = gt.Values.from_entries(
                [(k, "SE2", np.zeros(3)) for k in range(n)])
            g32 = graph.astype(jnp.float32)
            v32 = vals.astype(jnp.float32)
            bound = g32.bind(v32)
            sup = SupernodalCholeskySolver(bound)
            lam = 1e-4
            blocks, g = sup.system(v32.arrays)
            x_chol = sup.solve_factored(sup.factorize(blocks, lam), g)
            x_qr = sup.solve_qr(v32.arrays, g=g, lam=lam)
            H, gd = bound.gn_system(v32.arrays)
            ref = np.linalg.solve(
                np.asarray(H, np.float64) + lam * np.eye(H.shape[0]),
                np.asarray(gd, np.float64))
            sc = max(1.0, np.abs(ref).max())
            np.testing.assert_allclose(np.asarray(x_qr), np.asarray(x_chol),
                                       atol=5e-4 * sc)
            np.testing.assert_allclose(np.asarray(x_chol, np.float64), ref,
                                       atol=5e-4 * sc)
        finally:
            cfg.set_default_dtype(jnp.float64)

    @pytest.mark.slow
    def test_qr_matches_cholesky_w100(self):
        """Reference test idiom #5 (SURVEY §4): QR and Cholesky elimination
        produce the same solution (linear/tests/testGaussianFactorGraph.cpp),
        here on the sparse supernodal paths over w100."""
        import gtsam_tpu as gt
        from gtsam_tpu.io import datasets
        from gtsam_tpu import config as cfg
        cfg.set_default_dtype(jnp.float32)
        try:
            graph, initial = datasets.load_2d(
                datasets.find_example_data("w100.graph"))
            graph.add(gt.prior_factors(
                "SE2", [0], np.zeros((1, 3)),
                gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])))
            g32 = graph.astype(jnp.float32)
            vals32 = initial.astype(jnp.float32)
            bound = g32.bind(vals32)
            sup = SupernodalCholeskySolver(bound)
            lam = 1e-4
            blocks, g = sup.system(vals32.arrays)
            x_chol = sup.solve_factored(sup.factorize(blocks, lam), g)
            x_qr = sup.solve_qr(vals32.arrays, g=g, lam=lam)
            H, gd = bound.gn_system(vals32.arrays)
            ref = np.linalg.solve(
                np.asarray(H, np.float64) + lam * np.eye(H.shape[0]),
                np.asarray(gd, np.float64))
            sc = np.abs(ref).max()
            e_chol = np.abs(np.asarray(x_chol, np.float64) - ref).max() / sc
            e_qr = np.abs(np.asarray(x_qr, np.float64) - ref).max() / sc
            # same solution to f32 working precision...
            np.testing.assert_allclose(np.asarray(x_qr), np.asarray(x_chol),
                                       atol=5e-4 * sc)
            # ...and QR at least as accurate as Cholesky (kappa vs kappa^2;
            # measured on this fixture: 4.1e-5 vs 1.2e-4)
            assert e_qr <= 2.0 * e_chol
        finally:
            cfg.set_default_dtype(jnp.float64)
