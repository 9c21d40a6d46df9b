"""Sim3, distortion calibrations, samplers, labeled symbols."""

import jax
import jax.numpy as jnp
import numpy as np

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
