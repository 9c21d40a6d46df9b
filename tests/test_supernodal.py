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
