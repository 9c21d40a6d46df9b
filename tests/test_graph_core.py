"""Factor-graph core: linearization vs finite differences (the reference's
EXPECT_CORRECT_FACTOR_JACOBIANS idiom, nonlinear/factorTesting.h), noise models,
losses, optimizers on fixture graphs with known answers (tests/smallExample.h
idiom)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gtsam_tpu as gt
from gtsam_tpu.graph import factors as factors_mod
from gtsam_tpu.graph import manifolds

rng = np.random.default_rng(7)


def fd_jacobian(f, x0, dim, eps=1e-7):
    """Central-difference Jacobian of f: (dim,)->(r,) around 0."""
    cols = []
    for i in range(dim):
        d = np.zeros(dim)
        d[i] = eps
        cols.append((f(jnp.asarray(d)) - f(jnp.asarray(-d))) / (2 * eps))
    return jnp.stack(cols, axis=-1)


class TestLinearize:
    def _check_batch(self, batch, xs, atol=1e-6):
        wJ, b = factors_mod.linearize(batch, xs)
        n = batch.num_factors
        retracts = [manifolds.get(t).retract for t in batch.var_types]
        dims = batch.dims()
        for k in range(min(n, 3)):
            xk = tuple(jax.tree.map(lambda a: a[k], x) for x in xs)
            mk = jax.tree.map(lambda a: a[k], batch.measurements)
            for s in range(batch.arity):
                def f(d, s=s, xk=xk):
                    xp = list(xk)
                    xp[s] = retracts[s](xk[s], d)
                    return batch.residual_fn(tuple(xp), mk)
                Jfd = fd_jacobian(f, None, dims[s])
                if batch.noise.kind == "unit":
                    Jfd_w = Jfd
                elif batch.noise.kind == "diagonal":
                    row = batch.noise.data[k % batch.noise.data.shape[0]]
                    Jfd_w = Jfd * row[:, None]
                else:
                    Rk = batch.noise.data[k % batch.noise.data.shape[0]]
                    Jfd_w = Rk @ Jfd
                np.testing.assert_allclose(wJ[s][k], Jfd_w, atol=atol)

    @pytest.mark.slow

    def test_between_se3_jacobians(self):
        from gtsam_tpu.geometry import se3, so3
        n = 5
        T = se3.SE3(so3.expmap(jnp.asarray(rng.normal(size=(n, 3)))),
                    jnp.asarray(rng.normal(size=(n, 3))))
        T2 = se3.SE3(so3.expmap(jnp.asarray(rng.normal(size=(n, 3)))),
                     jnp.asarray(rng.normal(size=(n, 3))))
        meas = se3.SE3(so3.expmap(jnp.asarray(rng.normal(size=(n, 3)))),
                       jnp.asarray(rng.normal(size=(n, 3))))
        batch = gt.between_factors("SE3", np.arange(n), np.arange(n) + 100, meas,
                                   gt.noise.isotropic(6, 0.3))
        self._check_batch(batch, (T, T2))

    @pytest.mark.slow

    def test_between_se2_jacobians(self):
        n = 4
        x1 = jnp.asarray(rng.normal(size=(n, 3)))
        x2 = jnp.asarray(rng.normal(size=(n, 3)))
        meas = jnp.asarray(rng.normal(size=(n, 3)))
        batch = gt.between_factors("SE2", np.arange(n), np.arange(n) + 100, meas,
                                   gt.noise.sigmas(np.abs(rng.normal(size=(n, 3))) + 0.1))
        self._check_batch(batch, (x1, x2))

    @pytest.mark.slow

    def test_prior_so3_jacobians(self):
        from gtsam_tpu.geometry import so3
        n = 3
        R = so3.expmap(jnp.asarray(rng.normal(size=(n, 3))))
        meas = so3.expmap(jnp.asarray(rng.normal(size=(n, 3))))
        batch = gt.prior_factors("SO3", np.arange(n), meas, gt.noise.isotropic(3, 0.1))
        self._check_batch(batch, (R,))


class TestNoise:
    def test_information_whiten(self):
        M = np.array([[4.0, 1.0], [1.0, 2.0]])
        nm = gt.noise.information(M)
        r = jnp.asarray(rng.normal(size=(5, 2)))
        wr = nm.whiten(r)
        # ||whiten(r)||^2 == r' M r
        for k in range(5):
            np.testing.assert_allclose(
                float(wr[k] @ wr[k]), float(r[k] @ M @ r[k]), rtol=1e-12)

    def test_sigmas_vs_information_consistency(self):
        s = np.array([0.5, 2.0, 1.0])
        nm1 = gt.noise.sigmas(s)
        nm2 = gt.noise.information(np.diag(1.0 / s**2))
        r = jnp.asarray(rng.normal(size=(4, 3)))
        np.testing.assert_allclose(nm1.error(r), nm2.error(r), rtol=1e-12)

    def test_robust_error(self):
        nm = gt.noise.robust(gt.noise.isotropic(2, 1.0), "huber")
        r_small = jnp.asarray([[0.1, 0.1]])
        # below threshold: same as quadratic
        np.testing.assert_allclose(nm.error(r_small), 0.5 * 0.02, rtol=1e-9)
        r_big = jnp.asarray([[30.0, 40.0]])  # norm 50
        k = 1.345
        np.testing.assert_allclose(nm.error(r_big), k * 50 - 0.5 * k * k, rtol=1e-9)


class TestLosses:
    def test_weights_at_zero(self):
        from gtsam_tpu.base.losses import LOSSES
        for name, ctor in LOSSES.items():
            if name == "l2_with_dead_zone":
                continue
            loss = ctor()
            w = float(loss.weight(jnp.asarray(0.0)))
            assert w == 1.0, name

    def test_huber_continuity(self):
        from gtsam_tpu.base.losses import huber
        h = huber(1.345)
        d = jnp.asarray([1.345 - 1e-9, 1.345 + 1e-9])
        losses = h.loss(d)
        np.testing.assert_allclose(losses[0], losses[1], atol=1e-6)


class TestOptimize:
    def _chain_graph(self):
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[0.3, 0.3, 0.1]])))
        g.add(gt.between_factors("SE2", [0, 1], [1, 2],
                                 np.array([[2.0, 0.0, 0.0], [2.0, 0.0, 0.0]]),
                                 gt.noise.sigmas([[0.2, 0.2, 0.1]])))
        init = gt.Values.from_entries([
            (0, "SE2", np.array([0.5, 0.0, 0.2])),
            (1, "SE2", np.array([2.3, 0.1, -0.2])),
            (2, "SE2", np.array([4.1, 0.1, 0.1])),
        ])
        return g, init

    def test_gauss_newton_exact(self):
        g, init = self._chain_graph()
        res = gt.gauss_newton(g, init)
        assert res.converged
        assert res.error < 1e-20
        got = np.asarray(res.values.arrays["SE2"])
        np.testing.assert_allclose(got[:, 0], [0.0, 2.0, 4.0], atol=1e-9)

    def test_lm_matches_gn(self):
        g, init = self._chain_graph()
        r1 = gt.gauss_newton(g, init)
        r2 = gt.levenberg_marquardt(g, init)
        np.testing.assert_allclose(r2.error, r1.error, atol=1e-12)

    def test_dogleg(self):
        g, init = self._chain_graph()
        r = gt.dogleg(g, init)
        assert r.error < 1e-18

    def test_dogleg_sparse_matches_dense(self):
        # dogleg now takes the supernodal sparse solver (was dense-only)
        from gtsam_tpu.optimize.optimizers import DenseSolver, SparseSolver
        g, init = self._chain_graph()
        rd = gt.dogleg(g, init, solver=DenseSolver())
        rs = gt.dogleg(g, init, solver=SparseSolver())
        assert rs.error < 1e-15
        np.testing.assert_allclose(rs.error, rd.error, atol=1e-15)

    @pytest.mark.slow

    def test_nonlinear_cg_matches_gn(self):
        g, init = self._chain_graph()
        ref = gt.gauss_newton(g, init)
        r = gt.nonlinear_conjugate_gradient(
            g, init, gt.OptimizerParams(max_iterations=500,
                                        relative_error_tol=1e-12,
                                        absolute_error_tol=1e-12))
        assert r.error < ref.error + 1e-6

    def test_loop_closure_se2(self):
        # square loop with noisy initial; known optimum from constraints
        meas = np.array([[2.0, 0.0, np.pi / 2]] * 4)
        g = gt.FactorGraph()
        g.add(gt.prior_factors("SE2", [0], np.zeros((1, 3)),
                               gt.noise.sigmas([[0.1, 0.1, 0.05]])))
        g.add(gt.between_factors("SE2", [0, 1, 2, 3], [1, 2, 3, 0], meas,
                                 gt.noise.sigmas([[0.2, 0.2, 0.1]] * 4)))
        init = gt.Values.from_entries([
            (0, "SE2", np.array([0.1, -0.1, 0.05])),
            (1, "SE2", np.array([2.1, 0.2, 1.5])),
            (2, "SE2", np.array([1.8, 2.2, 3.0])),
            (3, "SE2", np.array([0.1, 2.1, -1.5])),
        ])
        res = gt.levenberg_marquardt(g, init)
        assert res.error < 1e-15  # perfectly consistent measurements
        got = np.asarray(res.values.arrays["SE2"])
        np.testing.assert_allclose(got[0], [0, 0, 0], atol=1e-7)
        np.testing.assert_allclose(got[2][:2], [2.0, 2.0], atol=1e-7)


class TestValues:
    def test_retract_local_roundtrip(self):
        from gtsam_tpu.geometry import se3, so3
        v = gt.Values.from_entries([
            (1, "SE3", se3.SE3(jnp.eye(3), jnp.zeros(3))),
            (2, "Point3", jnp.asarray([1.0, 2, 3])),
            (3, "SE2", jnp.zeros(3)),
        ])
        lay = v.layout()
        assert lay.total_dim == 6 + 3 + 3
        delta = jnp.asarray(rng.normal(size=lay.total_dim)) * 0.3
        v2 = v.retract(delta)
        back = v.local(v2)
        np.testing.assert_allclose(back, delta, atol=1e-12)
