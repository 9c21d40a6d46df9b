"""Pallas kernel tests (interpret mode on CPU; TPU path exercised by bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_tpu.linear.pallas_kernels import (
    segment_offsets_from_ids, segmented_block_sum)

rng = np.random.default_rng(21)


class TestSegmentedBlockSum:
    def test_matches_segment_sum(self):
        P, W, U = 777, 128, 33
        seg = np.sort(rng.integers(0, U, size=P)).astype(np.int32)
        prods = jnp.asarray(rng.normal(size=(P, W)).astype(np.float32))
        offs = segment_offsets_from_ids(seg, U)
        out = segmented_block_sum(prods, jnp.asarray(offs), U, interpret=True)
        ref = jax.ops.segment_sum(prods, jnp.asarray(seg), U)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_empty_segments(self):
        P, W, U = 50, 128, 20
        # leave some cells empty
        seg = np.sort(rng.choice(np.arange(0, U, 2), size=P)).astype(np.int32)
        prods = jnp.asarray(rng.normal(size=(P, W)).astype(np.float32))
        offs = segment_offsets_from_ids(seg, U)
        out = segmented_block_sum(prods, jnp.asarray(offs), U, interpret=True)
        ref = jax.ops.segment_sum(prods, jnp.asarray(seg), U)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        # odd cells are exactly zero
        assert float(jnp.abs(out[1::2]).max()) == 0.0
