"""Pseudospectral function bases: Chebyshev (second kind) and Fourier.

Reference: gtsam/basis — Chebyshev2.h:46 (Points, CalculateWeights:97,
DifferentiationMatrix:111), Fourier.h, FitBasis.h, BasisFactors.h.
"""

import jax.numpy as jnp
import numpy as np

from ..base import noise as noise_mod
from ..graph import factors as factors_mod


def chebyshev2_points(N: int, a: float = -1.0, b: float = 1.0) -> np.ndarray:
    """N Chebyshev points of the second kind on [a, b] (Chebyshev2::Points)."""
    if N == 1:
        return np.array([(a + b) / 2.0])
    t = np.arange(N)
    x = np.cos(np.pi * (N - 1 - t) / (N - 1))  # ascending in [-1, 1]
    return (a + b) / 2.0 + (b - a) / 2.0 * x


def chebyshev2_weights(N: int, a: float, b: float, x: float) -> np.ndarray:
    """Barycentric interpolation weights at x (Chebyshev2::CalculateWeights)."""
    pts = chebyshev2_points(N, a, b)
    # barycentric weights for Chebyshev-2 points
    w = np.ones(N)
    w[::2] = 1.0
    w = np.array([(-1.0) ** j for j in range(N)])
    w[0] *= 0.5
    w[-1] *= 0.5
    d = x - pts
    hit = np.abs(d) < 1e-14
    if hit.any():
        out = np.zeros(N)
        out[np.argmax(hit)] = 1.0
        return out
    t = w / d
    return t / t.sum()


def chebyshev2_differentiation_matrix(N: int, a: float = -1.0,
                                      b: float = 1.0) -> np.ndarray:
    """Spectral differentiation matrix (Chebyshev2::DifferentiationMatrix)."""
    pts = chebyshev2_points(N, a, b)
    c = np.ones(N)
    c[0] = 2.0
    c[-1] = 2.0
    c = c * (-1.0) ** np.arange(N)
    X = np.tile(pts, (N, 1)).T
    dX = X - X.T + np.eye(N)
    D = np.outer(c, 1.0 / c) / dX
    D = D - np.diag(D.sum(axis=1))
    return D


def chebyshev1_basis(N: int, x, a: float = -1.0, b: float = 1.0) -> np.ndarray:
    """Chebyshev polynomial basis of the FIRST kind: rows [T_0(t)..T_{N-1}(t)]
    with t the affine map of x onto [-1,1] (gtsam/basis/Chebyshev.h
    Chebyshev1Basis::CalculateWeights), via the T recurrence."""
    x = np.atleast_1d(np.asarray(x, dtype=float))
    t = 2.0 * (x - a) / (b - a) - 1.0
    W = np.empty((len(t), N))
    W[:, 0] = 1.0
    if N > 1:
        W[:, 1] = t
    for k in range(2, N):
        W[:, k] = 2.0 * t * W[:, k - 1] - W[:, k - 2]
    return W


def chebyshev2_basis(N: int, x, a: float = -1.0, b: float = 1.0) -> np.ndarray:
    """Chebyshev polynomials of the second kind U_0..U_{N-1}
    (Chebyshev2Basis::CalculateWeights) — the weight-function basis, distinct
    from the chebyshev2_points interpolation above."""
    x = np.atleast_1d(np.asarray(x, dtype=float))
    t = 2.0 * (x - a) / (b - a) - 1.0
    W = np.empty((len(t), N))
    W[:, 0] = 1.0
    if N > 1:
        W[:, 1] = 2.0 * t
    for k in range(2, N):
        W[:, k] = 2.0 * t * W[:, k - 1] - W[:, k - 2]
    return W


def chebyshev1_derivative_weights(N: int, x, a: float = -1.0,
                                  b: float = 1.0) -> np.ndarray:
    """d/dx of the first-kind basis: T_k' = k U_{k-1}, chain-ruled through the
    affine map (Chebyshev1Basis::DerivativeWeights)."""
    x = np.atleast_1d(np.asarray(x, dtype=float))
    U = chebyshev2_basis(N, x, a, b)
    D = np.zeros((len(x), N))
    scale = 2.0 / (b - a)
    for k in range(1, N):
        D[:, k] = k * U[:, k - 1] * scale
    return D


def fourier_basis(N: int, x: np.ndarray) -> np.ndarray:
    """Fourier basis row(s): [1, cos t, sin t, cos 2t, sin 2t, ...] (Fourier.h)."""
    x = np.atleast_1d(x)
    cols = [np.ones_like(x)]
    for k in range(1, (N + 1) // 2):
        cols.append(np.cos(k * x))
        cols.append(np.sin(k * x))
    return np.stack(cols[:N], axis=-1)


def fit_basis(xs, ys, N: int, kind: str = "chebyshev2", a=None, b=None,
              sigma: float = 1.0) -> np.ndarray:
    """Least-squares fit of basis coefficients to samples (FitBasis.h)."""
    xs = np.asarray(xs, dtype=float)
    ys = np.asarray(ys, dtype=float)
    if kind == "chebyshev2":
        a = xs.min() if a is None else a
        b = xs.max() if b is None else b
        A = np.stack([chebyshev2_weights(N, a, b, x) for x in xs])
    elif kind == "chebyshev1":
        a = xs.min() if a is None else a
        b = xs.max() if b is None else b
        A = chebyshev1_basis(N, xs, a, b)
    else:
        A = fourier_basis(N, xs)
    coeffs, *_ = np.linalg.lstsq(A / sigma, ys / sigma, rcond=None)
    return coeffs


def evaluation_factors(coeff_key: int, xs, ys, N: int, a: float, b: float,
                       noise: noise_mod.NoiseModel) -> factors_mod.FactorBatch:
    """EvaluationFactor batch: residual = w(x)^T c - y over a VecN coefficient
    variable (BasisFactors.h)."""
    W = jnp.asarray(np.stack([chebyshev2_weights(N, a, b, float(x))
                              for x in np.atleast_1d(xs)]))
    ys = jnp.asarray(np.atleast_1d(ys), dtype=float)
    n = len(ys)

    def fn(xvars, meas):
        w_row, y = meas
        return jnp.reshape(w_row @ xvars[0] - y, (1,))

    keys = np.full((n, 1), coeff_key, dtype=np.int64)
    return factors_mod.FactorBatch(
        "ChebyshevEvaluation", (f"Vec{N}",), keys, 1, fn, (W, ys), noise)
