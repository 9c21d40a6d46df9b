"""Two-float EFT correctness vs f64 oracles (CPU, x64 on via conftest)."""

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_tpu.base import twofloat as tf


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=shape) * scale).astype(np.float32)


def test_two_sum_exact():
    a = jnp.asarray(_rand((1000,), 1, 1e4))
    b = jnp.asarray(_rand((1000,), 2, 1e-4))
    s, e = jax.jit(tf.two_sum)(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(s.astype(jnp.float64) + e.astype(jnp.float64)),
        np.asarray(exact))


def test_two_prod_exact():
    a = jnp.asarray(_rand((1000,), 3, 1e3))
    b = jnp.asarray(_rand((1000,), 4, 1e-2))
    p, e = jax.jit(tf.two_prod)(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(p.astype(jnp.float64) + e.astype(jnp.float64)),
        np.asarray(exact))


def test_compensated_sum_beats_f32():
    # ill-conditioned sum: large + many smalls
    rng = np.random.default_rng(5)
    x = np.concatenate([[1e8], rng.normal(size=200000).astype(np.float64)])
    x32 = x.astype(np.float32)
    exact = np.sum(x32.astype(np.float64))
    h, l = jax.jit(lambda a: tf.from_f32_sum(a, 0))(jnp.asarray(x32))
    df = float(tf.to_f64(h, l))
    naive = float(jnp.sum(jnp.asarray(x32)))
    assert abs(df - exact) <= 1e-6 * abs(exact)
    assert abs(df - exact) < abs(naive - exact) or naive == exact


def test_df_add_mul_accuracy():
    a = _rand((5000,), 6, 10.0)
    b = _rand((5000,), 7, 0.1)
    ah, al = jnp.asarray(a), jnp.zeros_like(jnp.asarray(a))
    p_h, p_l = jax.jit(tf.mul_f)(ah, al, jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_allclose(np.asarray(tf.to_f64(p_h, p_l)), exact,
                               rtol=1e-13)
    s_h, s_l = jax.jit(tf.add)(p_h, p_l, ah, al)
    np.testing.assert_allclose(np.asarray(tf.to_f64(s_h, s_l)),
                               exact + a.astype(np.float64), rtol=1e-12)


def test_sum_axis_2d():
    x = _rand((64, 81), 8, 100.0)
    h, l = jax.jit(lambda a: tf.from_f32_sum(a, 0))(jnp.asarray(x))
    exact = x.astype(np.float64).sum(0)
    np.testing.assert_allclose(np.asarray(tf.to_f64(h, l)), exact,
                               rtol=1e-11, atol=1e-9)
