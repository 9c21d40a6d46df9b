"""Compact blocked dense Cholesky / triangular solves for LARGE matrices.

Why this exists: XLA's TPU lowering of `jnp.linalg.cholesky` fully unrolls the
blocked factorization over 128-wide panels.  At BA reduced-camera scale
(n = 9*1723 = 15507) that is ~122 inlined panel steps: measured round 4, the
resulting executable is 324 MB (527 MB with cho_solve + refinement), takes
57-158 s to compile, ~13 s to LOAD from a warm persistent cache, and tens of
seconds of first-execution program-upload through a remote-TPU tunnel.  The
reference hits the same wall nowhere because Eigen is host-side code
(gtsam/base/cholesky.h choleskyPartial).

This module implements the same math with STATIC-SHAPE-friendly loops so the
compiled program is O(stages) small:

- `blocked_cholesky`: staged masked right-looking factorization.  Panels of
  width B are processed by a `lax.fori_loop` per stage; each stage owns a
  static trailing window (the matrix suffix from the stage's first panel), so
  the per-panel work is a fixed-shape dynamic_slice + chol(B) leaf + (W,B)
  triangular solve + (W,W) MXU rank-B update, masked to the not-yet-factored
  region.  FLOP overhead vs a perfectly shrinking trailing update is ~1.2-1.5x
  (stage windows over-cover), all of it MXU matmul.
- `blocked_cho_solve`: panel forward/back substitution via fori_loop — full-row
  masked matvecs (n^2 flops total, trivial).

Executable size measured after the rewrite: 2.6 MB (vs 527 MB), compile 13 s
(vs 158 s), same solution to f32 roundoff.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _ceil_to(x, m):
    return -(-x // m) * m


def blocked_cholesky(S, panel: int = 256, stages: int = 4):
    """Lower-Cholesky factor of a symmetric PD (n, n) matrix.

    Returns L (n, n) lower-triangular with S = L @ L.T (upper part zeroed).
    Compiles to an O(stages)-size program regardless of n (see module doc).
    For n <= panel this falls straight through to jnp.linalg.cholesky.

    The panel column strip is formed as C @ inv(LD)^T (one MXU matmul) rather
    than a strip triangular_solve: XLA's triangular_solve on a (W, panel)
    operand compiles to a ~6 MB sub-program per instance, while the explicit
    panel inverse is tiny and its O(eps * cond(panel block)) error is at the
    same level as the factorization's own roundoff for the equilibrated
    systems this serves (callers refine iteratively on top).
    """
    n = S.shape[0]
    if n <= panel:
        return jnp.linalg.cholesky(S)
    dt = S.dtype
    npad = _ceil_to(n, panel)
    nb = npad // panel
    A = jnp.zeros((npad, npad), dtype=dt)
    A = A.at[:n, :n].set(S)
    if npad > n:
        A = A.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    eyeP = jnp.eye(panel, dtype=dt)

    # split the nb panels into <= `stages` contiguous groups; each group's
    # static trailing window starts at the group's first panel
    per = -(-nb // stages)
    bounds = [(s * per, min((s + 1) * per, nb)) for s in range(stages)
              if s * per < nb]

    for (p0, p1) in bounds:
        r0 = p0 * panel
        W = npad - r0                       # static window for this stage
        T = jax.lax.slice(A, (r0, r0), (npad, npad))
        rows = jnp.arange(W, dtype=jnp.int32)

        def body(k, T, p0=p0, W=W, rows=rows):
            q = (k - p0) * panel            # local offset in the window
            Y = jax.lax.dynamic_slice(T, (0, q), (W, panel))
            D = jax.lax.dynamic_slice(Y, (q, 0), (panel, panel))
            LD = jnp.linalg.cholesky(D)
            LDinv = jax.lax.linalg.triangular_solve(
                LD, eyeP, left_side=True, lower=True)
            below = rows >= q + panel
            C = jnp.where(below[:, None], Y, 0.0)
            X = C @ LDinv.T
            T = T - X @ X.T
            colL = X + jax.lax.dynamic_update_slice(
                jnp.zeros((W, panel), dtype=dt), LD, (q, 0))
            return jax.lax.dynamic_update_slice(T, colL, (0, q))

        T = jax.lax.fori_loop(p0, p1, body, T)
        A = jax.lax.dynamic_update_slice(A, T, (r0, r0))

    return jnp.tril(A[:n, :n])


def blocked_cho_solve(L, b, panel: int = 256):
    """Solve L @ L.T @ x = b given the lower factor (n, n) and b (n,).

    Panelled forward/backward substitution: each fori_loop step solves one
    B-wide diagonal block and applies one full-width masked matvec, so the
    program size is O(1) in n and the work is n^2 multiply-adds.
    """
    n = L.shape[0]
    if n <= panel:
        return jax.scipy.linalg.cho_solve((L, True), b)
    dt = L.dtype
    npad = _ceil_to(n, panel)
    nb = npad // panel
    Lp = jnp.zeros((npad, npad), dtype=dt)
    Lp = Lp.at[:n, :n].set(L)
    if npad > n:
        Lp = Lp.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    bp = jnp.zeros((npad,), dtype=dt).at[:n].set(b)
    cols = jnp.arange(npad, dtype=jnp.int32)

    # forward: y = L^-1 b
    def fwd(k, y):
        o = k * panel
        strip = jax.lax.dynamic_slice(Lp, (o, 0), (panel, npad))
        known = jnp.where(cols < o, y, 0.0)
        rhs = jax.lax.dynamic_slice(bp, (o,), (panel,)) - strip @ known
        D = jax.lax.dynamic_slice(strip, (0, o), (panel, panel))
        yk = jax.lax.linalg.triangular_solve(
            D, rhs[:, None], left_side=True, lower=True)[:, 0]
        return jax.lax.dynamic_update_slice(y, yk, (o,))

    y = jax.lax.fori_loop(0, nb, fwd, jnp.zeros((npad,), dtype=dt))

    # backward: x = L^-T y
    def bwd(i, x):
        k = nb - 1 - i
        o = k * panel
        colstrip = jax.lax.dynamic_slice(Lp, (0, o), (npad, panel))
        known = jnp.where(cols >= o + panel, x, 0.0)
        rhs = (jax.lax.dynamic_slice(y, (o,), (panel,))
               - colstrip.T @ known)
        D = jax.lax.dynamic_slice(colstrip, (o, 0), (panel, panel))
        xk = jax.lax.linalg.triangular_solve(
            D, rhs[:, None], left_side=True, lower=True, transpose_a=True)[:, 0]
        return jax.lax.dynamic_update_slice(x, xk, (o,))

    x = jax.lax.fori_loop(0, nb, bwd, jnp.zeros((npad,), dtype=dt))
    return x[:n]
