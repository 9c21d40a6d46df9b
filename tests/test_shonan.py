"""Shonan rotation averaging tests (testShonanAveraging idioms): global
optimality certificate, solution-beats-truth on the noisy objective, and the
p>3 staircase path."""

import numpy as np
import pytest

import jax.numpy as jnp

from gtsam_tpu.geometry import so3
from gtsam_tpu.sfm import shonan

rng = np.random.default_rng(1)


def make_problem(n=15, noise=0.03, extra_edges=10):
    R_true = np.asarray(so3.expmap(jnp.asarray(rng.normal(scale=0.8, size=(n, 3)))))
    R_true = np.einsum("ab,nbc->nac", R_true[0].T, R_true)
    edges = [(i, i + 1, R_true[i].T @ R_true[i + 1]) for i in range(n - 1)]
    for _ in range(extra_edges):
        i, j = sorted(rng.choice(n, 2, replace=False))
        edges.append((int(i), int(j), R_true[i].T @ R_true[j]))
    noisy = [(i, j,
              np.asarray(so3.expmap(jnp.asarray(rng.normal(scale=noise, size=3)))) @ R)
             for (i, j, R) in edges]
    return R_true, noisy


def cost(edges, R):
    return sum(float(np.sum((R[j] - R[i] @ Rij) ** 2)) for (i, j, Rij) in edges)


class TestShonan:
    @pytest.mark.slow
    def test_certified_and_optimal(self):
        R_true, edges = make_problem()
        R_est, lam = shonan.shonan_averaging(edges, 15)
        R_est = np.asarray(R_est)
        assert lam > -1e-4  # certified global optimum
        # the certified optimum must not be worse than ground truth on the
        # noisy objective
        assert cost(edges, R_est) <= cost(edges, R_true) * (1 + 1e-6)
        # and should be close to the truth at this noise level
        errs = [float(jnp.linalg.norm(so3.logmap(
            jnp.asarray(R_true[i].T @ R_est[i])))) for i in range(15)]
        assert max(errs) < 0.15

    @pytest.mark.slow

    def test_noise_free_exact(self):
        R_true, _ = make_problem(n=8, noise=0.0, extra_edges=5)
        edges = [(i, i + 1, R_true[i].T @ R_true[i + 1]) for i in range(7)]
        R_est, lam = shonan.shonan_averaging(edges, 8)
        R_est = np.asarray(R_est)
        assert lam > -1e-6
        for i in range(8):
            np.testing.assert_allclose(R_est[i], R_true[i], atol=1e-5)

    def test_staircase_p4(self):
        """Force the staircase through p=4: lift/round/certify must still work."""
        R_true, edges = make_problem(n=8, noise=0.02, extra_edges=6)
        params = shonan.ShonanParams(p_min=4, p_max=6)
        R_est, lam = shonan.shonan_averaging(edges, 8, params)
        R_est = np.asarray(R_est)
        assert lam > -1e-4
        errs = [float(jnp.linalg.norm(so3.logmap(
            jnp.asarray(R_true[i].T @ R_est[i])))) for i in range(8)]
        assert max(errs) < 0.1

    def test_son_manifold(self):
        name = shonan.register_son(5)
        from gtsam_tpu.graph import manifolds
        m = manifolds.get(name)
        assert m.dim == 10
        xi = jnp.asarray(rng.normal(size=10) * 0.1)
        Q = m.retract(jnp.eye(5), xi)
        # orthogonality preserved
        np.testing.assert_allclose(np.asarray(Q @ Q.T), np.eye(5), atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(np.asarray(Q)), 1.0, atol=1e-9)
