"""Lie-group invariant tests, mirroring the reference's testLie.cpp /
chartTesting.h idioms (SURVEY.md §4 item 2), plus autodiff cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_tpu.geometry import se2, se3, so3

rng = np.random.default_rng(42)


def random_w(n=8, scale=1.0):
    w = rng.normal(size=(n, 3)) * scale
    # keep rotation angles below the pi cut locus for exact roundtrips
    norms = np.linalg.norm(w, axis=-1, keepdims=True)
    w = np.where(norms > 3.0, w * (3.0 / norms), w)
    return jnp.asarray(w)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = random_w()
        R = so3.expmap(w)
        np.testing.assert_allclose(so3.logmap(R), w, atol=1e-12)

    def test_exp_log_small(self):
        w = random_w(scale=1e-8)
        np.testing.assert_allclose(so3.logmap(so3.expmap(w)), w, atol=1e-15)

    def test_log_near_pi(self):
        axis = rng.normal(size=(8, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        for theta in [np.pi - 1e-7, np.pi - 1e-3, 3.0]:
            w = jnp.asarray(axis * theta)
            R = so3.expmap(w)
            w2 = so3.logmap(R)
            np.testing.assert_allclose(so3.expmap(w2), R, atol=1e-9)

    def test_orthogonality(self):
        R = so3.expmap(random_w())
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ so3.inverse(R), eye, atol=1e-14)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-14)

    def test_retract_local_inverse(self):
        R1 = so3.expmap(random_w())
        R2 = so3.expmap(random_w())
        d = so3.local(R1, R2)
        np.testing.assert_allclose(so3.retract(R1, d), R2, atol=1e-12)

    def test_right_jacobian_vs_autodiff(self):
        w = random_w(4)

        def log_retract(d, w0):
            return so3.logmap(so3.expmap(w0) @ so3.expmap(d).T @ so3.expmap(w0).T)

        # J_r = d/dd Log(Exp(w+...)): check Exp(w)Exp(Jr d) ≈ Exp(w+d)
        for i in range(4):
            wi = w[i]
            Jr = so3.right_jacobian(wi)
            d = 1e-6 * jnp.asarray(rng.normal(size=3))
            lhs = so3.expmap(wi + d)
            rhs = so3.expmap(wi) @ so3.expmap(Jr @ d)
            np.testing.assert_allclose(lhs, rhs, atol=1e-10)

    def test_left_jacobian_inverse(self):
        w = random_w(4)
        V = so3.left_jacobian(w)
        Vinv = so3.left_jacobian_inverse(w)
        eye = jnp.broadcast_to(jnp.eye(3), V.shape)
        np.testing.assert_allclose(V @ Vinv, eye, atol=1e-12)

    def test_quaternion_roundtrip(self):
        R = so3.expmap(random_w(16, 2.0))
        q = so3.to_quaternion(R)
        np.testing.assert_allclose(so3.from_quaternion(q), R, atol=1e-12)

    @pytest.mark.slow

    def test_expmap_grad_at_zero_no_nan(self):
        J = jax.jacfwd(so3.expmap)(jnp.zeros(3))
        assert not np.any(np.isnan(J))
        J2 = jax.jacfwd(so3.logmap)(jnp.eye(3))
        assert not np.any(np.isnan(J2))


class TestSE3:
    def rand(self, n=8):
        return se3.SE3(so3.expmap(random_w(n)), jnp.asarray(rng.normal(size=(n, 3))))

    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(rng.normal(size=(8, 6)))
        # keep ||omega|| < pi so the tangent roundtrip is exact
        xi = xi.at[:, :3].multiply(0.5)
        np.testing.assert_allclose(se3.logmap(se3.expmap(xi)), xi, atol=1e-12)
        # beyond the cut locus the representation must still roundtrip
        xi_big = jnp.asarray(rng.normal(size=(8, 6)) * 3.0)
        T = se3.expmap(xi_big)
        T2 = se3.expmap(se3.logmap(T))
        np.testing.assert_allclose(T2.R, T.R, atol=1e-9)
        np.testing.assert_allclose(T2.t, T.t, atol=1e-9)

    def test_compose_inverse(self):
        T = self.rand()
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(I.R, jnp.broadcast_to(jnp.eye(3), I.R.shape), atol=1e-13)
        np.testing.assert_allclose(I.t, 0.0, atol=1e-13)

    def test_retract_local(self):
        T1, T2 = self.rand(), self.rand()
        d = se3.local(T1, T2)
        T2b = se3.retract(T1, d)
        np.testing.assert_allclose(T2b.R, T2.R, atol=1e-12)
        np.testing.assert_allclose(T2b.t, T2.t, atol=1e-12)

    def test_adjoint(self):
        # Ad_T xi == Log(T Exp(xi) T^-1)
        T = self.rand(1)
        T1 = se3.SE3(T.R[0], T.t[0])
        xi = 0.1 * jnp.asarray(rng.normal(size=6))
        lhs = se3.adjoint(T1) @ xi
        rhs = se3.logmap(se3.compose(se3.compose(T1, se3.expmap(xi)), se3.inverse(T1)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)

    def test_transform_roundtrip(self):
        T = self.rand()
        p = jnp.asarray(rng.normal(size=(8, 3)))
        np.testing.assert_allclose(se3.transform_to(T, se3.transform_from(T, p)), p,
                                   atol=1e-12)


class TestSE2:
    def rand(self, n=8):
        return jnp.asarray(rng.normal(size=(n, 3)))

    def test_exp_log_roundtrip(self):
        xi = self.rand() * 0.8
        np.testing.assert_allclose(se2.logmap(se2.expmap(xi)), xi, atol=1e-12)

    def test_compose_inverse(self):
        p = self.rand()
        np.testing.assert_allclose(se2.compose(p, se2.inverse(p)), 0.0, atol=1e-13)

    def test_retract_local(self):
        p1, p2 = self.rand(), self.rand()
        d = se2.local(p1, p2)
        got = se2.retract(p1, d)
        # compare poses modulo angle wrap
        np.testing.assert_allclose(got[..., :2], p2[..., :2], atol=1e-12)
        np.testing.assert_allclose(np.cos(got[..., 2]), np.cos(p2[..., 2]), atol=1e-12)
        np.testing.assert_allclose(np.sin(got[..., 2]), np.sin(p2[..., 2]), atol=1e-12)

    def test_transform_roundtrip(self):
        p = self.rand()
        pt = jnp.asarray(rng.normal(size=(8, 2)))
        np.testing.assert_allclose(se2.transform_to(p, se2.transform_from(p, pt)), pt,
                                   atol=1e-13)
