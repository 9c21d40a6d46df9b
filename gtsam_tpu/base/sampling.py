"""Noise sampling utilities.

Reference: gtsam/linear/Sampler.{h,cpp} (sample from a noise model),
gtsam/base/WeightedSampler.h (weighted sampling without replacement).
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import noise as noise_mod


def sample_noise(model: noise_mod.NoiseModel, key, shape_n: int):
    """Draw (n, rdim) samples with the model's covariance (Sampler analog)."""
    if model.kind == "unit":
        raise ValueError("unit model has unknown dimension; use diagonal")
    if model.kind == "diagonal":
        sigmas = 1.0 / model.data
        n = model.data.shape[0]
        eps = jax.random.normal(key, (shape_n, model.data.shape[-1]))
        return eps * jnp.broadcast_to(sigmas, eps.shape)
    # gaussian: whitened = R r ~ N(0, I) -> r = R^-1 eps
    R = model.data
    eps = jax.random.normal(key, (shape_n, R.shape[-1]))
    Rb = jnp.broadcast_to(R, (shape_n,) + R.shape[-2:]) if R.shape[0] == 1 else R
    return jax.vmap(lambda Rk, ek: jnp.linalg.solve(Rk, ek))(Rb, eps)


def weighted_sample_without_replacement(rng: np.random.Generator, weights,
                                        k: int):
    """Efraimidis-Spirakis weighted sampling w/o replacement (WeightedSampler.h)."""
    w = np.asarray(weights, dtype=float)
    u = rng.uniform(size=len(w))
    keys = u ** (1.0 / np.maximum(w, 1e-300))
    return np.argsort(-keys)[:k]
