"""Pallas TPU kernels for the hot gather/reduce ops.

Round-1 kernel: segmented block-sum — reduce P sorted (81,)-wide pair-product
rows into U unique destination cells (the reduced-camera-system assembly in
sfm/ba.py).  XLA lowers the equivalent segment_sum to a scatter-add; on TPU,
scatters serialize per duplicate index.  Here each grid step owns ONE output
cell and accumulates its contiguous run with a fori_loop over VMEM rows —
no conflicts by construction.  Offsets arrive via scalar prefetch
(PrefetchScalarGridSpec) so the DMA schedule is known before the body runs.

Enabled on TPU via use_pallas=True call sites; numerics are validated against
jax.ops.segment_sum in interpret mode on CPU (tests/test_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_sum_kernel(offsets_ref, prods_ref, out_ref):
    """One grid step = one output cell: sum rows [start, end) of prods."""
    cell = pl.program_id(0)
    start = offsets_ref[cell]
    end = offsets_ref[cell + 1]

    def body(i, acc):
        return acc + prods_ref[pl.ds(start + i, 1), :]

    n = end - start
    acc0 = jnp.zeros((1, prods_ref.shape[1]), dtype=prods_ref.dtype)
    out_ref[...] = jax.lax.fori_loop(0, n, body, acc0)


def segmented_block_sum(prods, offsets, num_cells: int, interpret: bool = False):
    """prods: (P, W) rows sorted by cell; offsets: (U+1,) int32 run boundaries.

    Returns (U, W) per-cell sums.  W should be a multiple-of-128-friendly
    width (81 pads to 128 internally).
    """
    P, W = prods.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_cells,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, W), lambda c, offsets: (c, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _seg_sum_kernel,
        out_shape=jax.ShapeDtypeStruct((num_cells, W), prods.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, prods)


def segment_offsets_from_ids(seg_ids: np.ndarray, num_cells: int) -> np.ndarray:
    """Sorted segment ids -> (U+1,) run-boundary offsets (host-side)."""
    counts = np.bincount(seg_ids, minlength=num_cells)
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
