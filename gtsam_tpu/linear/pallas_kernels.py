"""Pallas TPU kernels for the hot gather/reduce ops.

Round-1 kernel: segmented block-sum — reduce P sorted (81,)-wide pair-product
rows into U unique destination cells (the reduced-camera-system assembly in
sfm/ba.py).  XLA lowers the equivalent segment_sum to a scatter-add; on TPU,
scatters serialize per duplicate index.  Here each grid step owns ONE output
cell and accumulates its contiguous run with a fori_loop over VMEM rows —
no conflicts by construction.  Offsets arrive via scalar prefetch
(PrefetchScalarGridSpec) so the DMA schedule is known before the body runs.

Status (kept honest): NOT wired into any production path.  The BA cell stage
instead uses born-cell-sorted gathers + pow2-padded contiguous bucket reduces
(sfm/ba.py sym path), which avoid the scatter problem without a custom
kernel; scripts/ab_pallas_cells.py A/Bs this kernel against that path on the
real TPU.  Numerics are validated against jax.ops.segment_sum in interpret
mode on CPU (tests/test_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_CELLS_PER_STEP = 8   # TPU sublane granularity for the output block
_RUN_CHUNK = 8        # rows DMA'd per inner step


def _seg_sum_kernel(offsets_ref, prods_ref, out_ref, scratch, sem):
    """One grid step = 8 output cells; each DMA-gathers its run in chunks."""
    base = pl.program_id(0) * _CELLS_PER_STEP
    W = out_ref.shape[1]

    chunk = jnp.int32(_RUN_CHUNK)
    for c_local in range(_CELLS_PER_STEP):
        cell = base + jnp.int32(c_local)
        start = offsets_ref[cell]
        end = offsets_ref[cell + 1]
        n = end - start

        def body(i, acc):
            i = i.astype(jnp.int32)
            dma = pltpu.make_async_copy(
                prods_ref.at[pl.ds(start + i * chunk, _RUN_CHUNK), :],
                scratch, sem)
            dma.start()
            dma.wait()
            row = jax.lax.broadcasted_iota(jnp.int32, (_RUN_CHUNK, 1), 0)
            mask = (i * chunk + row) < n
            return acc + jnp.sum(jnp.where(mask, scratch[...], 0.0), axis=0,
                                 keepdims=True)

        acc0 = jnp.zeros((1, W), dtype=out_ref.dtype)
        nchunks = jax.lax.div(n + chunk - jnp.int32(1), chunk)
        out_ref[pl.ds(c_local, 1), :] = jax.lax.fori_loop(
            jnp.int32(0), nchunks, body, acc0)


def segmented_block_sum(prods, offsets, num_cells: int, interpret: bool = False):
    """prods: (P, W) rows sorted by cell; offsets: (U+1,) int32 run boundaries.

    Returns (U, W) per-cell sums.  prods is zero-padded by one DMA chunk so
    fixed-size chunked copies may overrun the final run.
    """
    P, W = prods.shape
    prods_p = jnp.concatenate(
        [prods, jnp.zeros((_RUN_CHUNK, W), dtype=prods.dtype)])
    U_pad = -(-num_cells // _CELLS_PER_STEP) * _CELLS_PER_STEP
    pad = jnp.full((U_pad + 1 - offsets.shape[0],), offsets[-1],
                   dtype=offsets.dtype)
    offsets_p = jnp.concatenate([offsets, pad])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U_pad // _CELLS_PER_STEP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_CELLS_PER_STEP, W),
                               lambda c, offsets: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_RUN_CHUNK, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _seg_sum_kernel,
        out_shape=jax.ShapeDtypeStruct((U_pad, W), prods.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets_p, prods_p)
    return out[:num_cells]


def segment_offsets_from_ids(seg_ids: np.ndarray, num_cells: int) -> np.ndarray:
    """Sorted segment ids -> (U+1,) run-boundary offsets (host-side)."""
    counts = np.bincount(seg_ids, minlength=num_cells)
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
