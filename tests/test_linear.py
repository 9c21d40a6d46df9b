"""Linear solver tests: sparse level-scheduled block Cholesky vs dense
(the reference's QR-vs-Cholesky cross-check idiom, SURVEY.md §4 item 5)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import gtsam_tpu as gt
from gtsam_tpu.graph import factors as fm
from gtsam_tpu.linear.sparse import SparseCholeskySolver
from gtsam_tpu.optimize.optimizers import _dense_solve

rng = np.random.default_rng(3)


def mixed_graph(n=50, nl=8):
    g = gt.FactorGraph()
    g.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                           gt.noise.sigmas([[0.1, 0.1, 0.05]])))
    i_arr = np.arange(n - 1)
    meas = np.stack([np.ones(n - 1), np.zeros(n - 1),
                     rng.normal(scale=0.1, size=n - 1)], axis=1)
    g.add(gt.between_factors("SE2", i_arr, i_arr + 1, meas,
                             gt.noise.sigmas(np.tile([0.2, 0.2, 0.1], (n - 1, 1)))))
    lc_i = rng.integers(0, n - 20, size=10)
    lc_j = lc_i + rng.integers(5, 19, size=10)
    g.add(gt.between_factors("SE2", lc_i, lc_j,
                             rng.normal(scale=1.0, size=(10, 3)),
                             gt.noise.sigmas(np.tile([0.3, 0.3, 0.15], (10, 1)))))

    def br_res(xs, meas):
        from gtsam_tpu.geometry import se2
        return se2.transform_to(xs[0], xs[1]) - meas

    # every landmark observed at least twice (keeps H nonsingular at lam=0)
    obs_p = np.concatenate([rng.integers(0, n, size=2 * nl),
                            rng.integers(0, n, size=25)])
    obs_l = np.concatenate([np.repeat(np.arange(nl), 2),
                            rng.integers(0, nl, size=25)])
    keys = np.stack([obs_p, [gt.symbol("l", int(k)) for k in obs_l]], axis=1)
    g.add(fm.custom_factors("PoseLandmark", ("SE2", "Point2"), keys, br_res, 2,
                            rng.normal(size=(len(obs_p), 2)),
                            gt.noise.isotropic(2, 0.1)))
    entries = [(i, "SE2", np.array([i * 1.0, rng.normal() * 0.1,
                                    rng.normal() * 0.1])) for i in range(n)]
    entries += [(gt.symbol("l", k), "Point2", rng.normal(size=2) * 3)
                for k in range(nl)]
    return g, gt.Values.from_entries(entries)


class TestSparseCholesky:
    @pytest.mark.slow
    def test_matches_dense_solve(self):
        g, vals = mixed_graph()
        bound = g.bind(vals)
        H, grad = jax.jit(bound.gn_system)(vals.arrays)
        for lam in [0.0, 1e-3, 1.0]:
            dx_dense = _dense_solve(H, grad, lam, False)
            solver = SparseCholeskySolver(bound)
            dx_sparse = solver.solve(vals.arrays, lam)
            scale = float(jnp.abs(dx_dense).max())
            np.testing.assert_allclose(np.asarray(dx_sparse), np.asarray(dx_dense),
                                       atol=1e-9 * max(scale, 1.0))

    def test_lm_parity(self):
        g, vals = mixed_graph(n=30, nl=4)
        r_dense = gt.levenberg_marquardt(g, vals, gt.LMParams(max_iterations=15))
        r_sparse = gt.levenberg_marquardt(g, vals, gt.LMParams(max_iterations=15),
                                          solver=gt.SparseSolver())
        np.testing.assert_allclose(r_sparse.error, r_dense.error,
                                   rtol=1e-8, atol=1e-10)

    @pytest.mark.slow

    def test_tree_graph(self):
        """Pure tree (no loops): zero fill, single sweep."""
        n = 20
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[0.1, 0.1, 0.05]])))
        i_arr = np.arange(n - 1)
        g.add(gt.between_factors("SE2", i_arr, i_arr + 1,
                                 rng.normal(size=(n - 1, 3)),
                                 gt.noise.isotropic(3, 0.1)))
        entries = [(i, "SE2", rng.normal(size=3)) for i in range(n)]
        vals = gt.Values.from_entries(entries)
        bound = g.bind(vals)
        solver = SparseCholeskySolver(bound, order="natural")
        # chain in natural order: fill-free, exactly 2n-1 blocks
        assert solver.sym.nnz_blocks == 2 * n - 1
        H, grad = bound.gn_system(vals.arrays)
        dx_d = _dense_solve(H, grad, 0.0, False)
        dx_s = solver.solve(vals.arrays, 0.0)
        np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_d), atol=1e-9)


class TestSubgraphPCG:
    @pytest.mark.slow
    def test_matches_dense(self):
        from gtsam_tpu.linear.pcg import SubgraphPCGSolver
        g, vals = mixed_graph(n=40, nl=6)
        bound = g.bind(vals)
        H, grad = bound.gn_system(vals.arrays)
        dx = _dense_solve(H, grad, 1e-3, False)
        pcg = SubgraphPCGSolver(tol=1e-10).bind(bound)
        dx_sg = pcg.solve(pcg.system(vals.arrays), 1e-3, False)
        scale = float(jnp.abs(dx).max())
        np.testing.assert_allclose(np.asarray(dx_sg), np.asarray(dx),
                                   atol=1e-6 * max(scale, 1.0))

    @pytest.mark.slow

    def test_lm_with_subgraph(self):
        from gtsam_tpu.linear.pcg import SubgraphPCGSolver
        g, vals = mixed_graph(n=30, nl=4)
        r0 = gt.levenberg_marquardt(g, vals, gt.LMParams(max_iterations=12))
        r1 = gt.levenberg_marquardt(g, vals, gt.LMParams(max_iterations=12),
                                    solver=SubgraphPCGSolver())
        np.testing.assert_allclose(r1.error, r0.error, rtol=1e-5)


class TestNativeSymbolic:
    def test_native_matches_python(self):
        import os
        from gtsam_tpu.inference import ordering as om, symbolic as sm
        from gtsam_tpu import native as nat
        g, vals = mixed_graph(n=40, nl=6)
        bound = g.bind(vals)
        vid = {}
        for t in bound.layout.type_order:
            for r in range(len(vals.keys[t])):
                vid[(t, r)] = len(vid)
        fk = [np.stack([[vid[(t, int(r))] for r in st.rows[s]]
                        for s, t in enumerate(b.var_types)], axis=1)
              for b, st in zip(g.batches, bound.structures)]
        adj = om.adjacency_from_factors(fk, len(vid))
        perm = om.nested_dissection(adj)
        inv = np.empty(len(vid), dtype=np.int64)
        inv[perm] = np.arange(len(vid))
        s_nat = sm._analyze_native(adj, perm, inv)
        if s_nat is None:
            pytest.skip("native build unavailable")
        os.environ["GTSAM_TPU_NO_NATIVE"] = "1"
        nat._lib = None
        try:
            s_py = sm.analyze(adj, perm)
        finally:
            del os.environ["GTSAM_TPU_NO_NATIVE"]
            nat._lib = None
        assert s_nat.nnz_blocks == s_py.nnz_blocks
        np.testing.assert_array_equal(s_nat.parent, s_py.parent)
        np.testing.assert_array_equal(s_nat.block_row, s_py.block_row)
        np.testing.assert_array_equal(s_nat.block_col, s_py.block_col)
        for a, b in zip(s_nat.triples_by_level, s_py.triples_by_level):
            ta = np.stack(a).T
            tb = np.stack(b).T
            np.testing.assert_array_equal(ta[np.lexsort(ta.T)],
                                          tb[np.lexsort(tb.T)])


def test_sparse_export_matches_dense():
    """SparseEigen analog (gtsam/linear/SparseEigen.h): scipy CSR export of
    the whitened Jacobian reproduces the dense normal equations."""
    import numpy as np
    import gtsam_tpu as gt
    from gtsam_tpu.io import datasets
    from gtsam_tpu.linear.sparse_export import sparse_jacobian, sparse_hessian

    graph, initial = datasets.load_2d(
        datasets.find_example_data("noisyToyGraph.txt"))
    graph.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[1e-3, 1e-3, 1e-4]])))
    bound = graph.bind(initial)
    A, b = sparse_jacobian(bound, initial.arrays)
    Hs, gs = sparse_hessian(bound, initial.arrays)
    H, g = bound.gn_system(initial.arrays)
    assert np.allclose(Hs.toarray(), np.asarray(H), atol=1e-10)
    assert np.allclose(gs, np.asarray(g), atol=1e-10)
    assert A.shape[1] == bound.layout.total_dim
