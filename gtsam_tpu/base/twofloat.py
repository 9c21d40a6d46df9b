"""Two-float (double-float) arithmetic: ~48-bit precision from f32 pairs.

TPU-native replacement for emulated float64 in accumulation-dominated
chains.  XLA emulates f64 on TPU by expanding every op into long u32
mantissa-juggling sequences AT HLO LEVEL — measured on the Ladybug-1723
bundle-adjustment step (round 4): the f64 Gram/gradient chain bloats the
step program to 42 MB (38k HLO ops, ~3.8k of them u32), costing 80 s of
fresh compile, ~5 s of warm-cache deserialize and ~10 s of first-execution
program upload through the device tunnel.  The same chain in two-float f32
is a handful of native VPU ops per value: error-free transformations
(Knuth two-sum, Dekker two-product) represent each value as an unevaluated
sum hi + lo of f32s, giving ~2*24 = 48 significant bits — between f32 and
f64, and far beyond the ~1e-7 relative accuracy the BA refinement chain
needs.

All functions operate on (hi, lo) pairs of same-shape f32 arrays and are
jit/vmap-safe.  Products of f32 inputs are EXACT (two_prod), so a
two-float-accumulated Gram matrix is the exact Gram of the f32 Jacobians —
the property the f64 chain was providing.

No reference analog: GTSAM runs native f64 (Eigen) throughout.
"""

import jax
import jax.numpy as jnp

# Dekker split constant for f32 (24-bit mantissa -> s = 12): 2^12 + 1.
_SPLIT = 4097.0


def two_sum(a, b):
    """Error-free a + b: returns (s, e) with s = fl(a+b), s + e == a + b."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free a * b via Dekker splitting: (p, e), p + e == a*b exactly.

    If XLA contracts the `ah*bh - p` multiply-add into an FMA the error term
    only gets MORE accurate (fma(a,b,-p) is the one-op EFT), so the identity
    holds either way."""
    p = a * b
    ca = a * _SPLIT
    ah = ca - (ca - a)
    al = a - ah
    cb = b * _SPLIT
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(xh, xl, yh, yl):
    """Two-float + two-float (accurate version, ~20 flops)."""
    sh, se = two_sum(xh, yh)
    te = xl + yl + se
    return fast_two_sum(sh, te)


def add_f(xh, xl, y):
    """Two-float + f32."""
    sh, se = two_sum(xh, y)
    return fast_two_sum(sh, xl + se)


def mul_f(xh, xl, y):
    """Two-float * f32."""
    ph, pe = two_prod(xh, y)
    return fast_two_sum(ph, pe + xl * y)


def mul(xh, xl, yh, yl):
    """Two-float * two-float."""
    ph, pe = two_prod(xh, yh)
    return fast_two_sum(ph, pe + (xh * yl + xl * yh))


def neg(xh, xl):
    return -xh, -xl


def sub(xh, xl, yh, yl):
    """Two-float - two-float."""
    return add(xh, xl, -yh, -yl)


def recip(yh, yl):
    """Two-float reciprocal via one Newton step from the f32 estimate:
    r = r0 + r0*(1 - y*r0), the correction evaluated with an exact product
    (ph ~= 1 so 1 - ph is exact by Sterbenz)."""
    r0 = 1.0 / yh
    ph, pe = two_prod(yh, r0)
    e = ((1.0 - ph) - pe) - yl * r0
    return fast_two_sum(r0, r0 * e)


def sum_axis(xh, xl, axis):
    """Compensated reduction of a two-float array along `axis` by pairwise
    halving: log2(n) two-float vector adds.  (A variadic lax.reduce with a
    two-float combiner computes the same thing but its TPU lowering
    scalarizes the custom reducer — measured round 4 as a dominant
    executable-size term; the halving tree is plain vector code and is
    numerically the better summation order anyway.)"""
    if axis < 0:
        axis += xh.ndim
    n = xh.shape[axis]
    while n > 1:
        k = n // 2
        ah = jax.lax.slice_in_dim(xh, 0, k, axis=axis)
        al = jax.lax.slice_in_dim(xl, 0, k, axis=axis)
        bh = jax.lax.slice_in_dim(xh, k, 2 * k, axis=axis)
        bl = jax.lax.slice_in_dim(xl, k, 2 * k, axis=axis)
        xh_new, xl_new = add(ah, al, bh, bl)
        if n % 2:
            th = jax.lax.slice_in_dim(xh, 2 * k, n, axis=axis)
            tl = jax.lax.slice_in_dim(xl, 2 * k, n, axis=axis)
            hh = jax.lax.slice_in_dim(xh_new, 0, 1, axis=axis)
            hl = jax.lax.slice_in_dim(xl_new, 0, 1, axis=axis)
            hh, hl = add(hh, hl, th, tl)
            xh_new = jax.lax.concatenate(
                [hh, jax.lax.slice_in_dim(xh_new, 1, k, axis=axis)], axis) \
                if k > 1 else hh
            xl_new = jax.lax.concatenate(
                [hl, jax.lax.slice_in_dim(xl_new, 1, k, axis=axis)], axis) \
                if k > 1 else hl
        xh, xl = xh_new, xl_new
        n = k
    return (jnp.squeeze(xh, axis=axis), jnp.squeeze(xl, axis=axis))


def from_f32_sum(x, axis):
    """Sum a plain f32 array along `axis` into a two-float result (each
    element promoted exactly)."""
    return sum_axis(x, jnp.zeros_like(x), axis)


def to_f32(xh, xl):
    return xh + xl


def to_f64(xh, xl):
    """Exact promotion (for tests / x64 interop)."""
    return xh.astype(jnp.float64) + xl.astype(jnp.float64)


def from_f64(x):
    """Split an f64 array into a two-float pair (hi = round-to-f32, lo =
    remainder)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo
