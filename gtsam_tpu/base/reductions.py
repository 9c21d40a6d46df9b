"""Pow2-padded contiguous segment reductions (f32 and two-float).

TPU scatters with duplicate indices process rows serially, so all segmented
sums in the hot paths are restructured as: permute rows so each segment is
contiguous, pad each run to the next power of two, bucket runs by padded
length, and reduce each bucket with a dense reshape-sum (<= 2x row
inflation, no scatter).  Shared by the BA Schur chain (sfm/ba.py) and the
supernodal refinement matvec (linear/supernodal.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import twofloat as tf


def pow2_pad_plan(row_order, first, counts, sentinel):
    """Pad each sorted run to the next power of two and bucket runs by padded
    length.  Returns (pad_idx, buckets, run_order): pad_idx (R,) indexes the
    original rows (== sentinel for padding slots, which must map to a zero
    row); buckets = ((pos0, n_runs, P), ...) contiguous in pad_idx; run_order
    permutes the input runs into bucket order."""
    pows = np.maximum(1, 1 << np.ceil(np.log2(np.maximum(counts, 1))
                                      ).astype(np.int64))
    run_order = np.argsort(pows, kind="stable")
    pad_idx_parts, buckets = [], []
    pos = 0
    i = 0
    nruns = len(counts)
    while i < nruns:
        P = int(pows[run_order[i]])
        j = int(np.searchsorted(pows[run_order], P, side="right"))
        runs = run_order[i:j]
        block = np.full((len(runs), P), sentinel, dtype=np.int32)
        for r, run in enumerate(runs):
            c = int(counts[run])
            f = int(first[run])
            block[r, :c] = row_order[f:f + c]
        pad_idx_parts.append(block.reshape(-1))
        buckets.append((pos, len(runs), P))
        pos += len(runs) * P
        i = j
    pad_idx = (np.concatenate(pad_idx_parts).astype(np.int32)
               if pad_idx_parts else np.zeros(0, np.int32))
    return pad_idx, buckets, run_order


def padded_reduce(rows, pad_idx, buckets, num_out, out_ids):
    """Sum padded contiguous runs: rows (K, W) -> (num_out, W) scattered to
    out_ids (unique).  pad_idx slots == K gather an appended zero row."""
    W = rows.shape[1]
    ext = jnp.concatenate([rows, jnp.zeros((1, W), dtype=rows.dtype)])
    g = ext[jnp.asarray(pad_idx)]
    outs = [g[p0:p0 + n * P].reshape(n, P, W).sum(1) for (p0, n, P) in buckets]
    if not outs:
        return jnp.zeros((num_out, W), dtype=rows.dtype)
    red = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    return jnp.zeros((num_out, W), dtype=rows.dtype).at[
        jnp.asarray(out_ids)].set(red)


def window_sum_df(h, l, P):
    """Exact two-float sum of every P consecutive rows of an (n*P, W) pair
    via ONE f64 reduce_window.

    hi + lo of a two-float pair fits f64 exactly (24 + 24 significant bits
    < 53), f64 accumulation keeps the bucket sums exact to ~1e-16, and the
    result splits back into a pair exactly.  Why this shape: a reshape
    (n*P, W) -> (n, P, W) + sum(1) on a gathered operand lowers to
    row-proportional relayout code on TPU (measured round 4: ~4 MB per
    instance, ~300 MB across the BA Schur step); reduce_window is a single
    compact op, and f64 ELEMENTWISE/reduce ops lower compactly — it is f64
    gathers/reshapes that explode, and there are none here."""
    if jax.config.jax_enable_x64:
        g = h.astype(jnp.float64) + l.astype(jnp.float64)
        s = jax.lax.reduce_window(g, 0.0, jax.lax.add, (P, 1), (P, 1),
                                  'VALID')
        hi = s.astype(h.dtype)
        lo = (s - hi.astype(jnp.float64)).astype(h.dtype)
        return hi, lo
    # x64-off fallback: separate window sums (loses in-bucket compensation)
    return (jax.lax.reduce_window(h, 0.0, jax.lax.add, (P, 1), (P, 1),
                                  'VALID'),
            jax.lax.reduce_window(l, 0.0, jax.lax.add, (P, 1), (P, 1),
                                  'VALID'))


def padded_reduce_df(pair, pad_idx, buckets, num_out, out_ids):
    """Two-float padded_reduce: exact bucket reduction of (hi, lo) pairs via
    f64 window sums (see window_sum_df)."""
    h, l = pair
    W = h.shape[1]
    idx = jnp.asarray(pad_idx)
    ext_h = jnp.concatenate([h, jnp.zeros((1, W), dtype=h.dtype)])[idx]
    ext_l = jnp.concatenate([l, jnp.zeros((1, W), dtype=l.dtype)])[idx]
    outs_h, outs_l = [], []
    for (p0, n, P) in buckets:
        rh, rl = window_sum_df(ext_h[p0:p0 + n * P], ext_l[p0:p0 + n * P], P)
        outs_h.append(rh)
        outs_l.append(rl)
    if not outs_h:
        z = jnp.zeros((num_out, W), dtype=h.dtype)
        return z, z
    red_h = jnp.concatenate(outs_h) if len(outs_h) > 1 else outs_h[0]
    red_l = jnp.concatenate(outs_l) if len(outs_l) > 1 else outs_l[0]
    ids = jnp.asarray(out_ids)
    zh = jnp.zeros((num_out, W), dtype=h.dtype).at[ids].set(red_h)
    zl = jnp.zeros((num_out, W), dtype=l.dtype).at[ids].set(red_l)
    return zh, zl
