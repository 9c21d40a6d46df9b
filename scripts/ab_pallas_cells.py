"""A/B: Pallas segmented_block_sum vs the sorted-run pow2-bucket reduction
on the BA reduced-camera cell stage shapes (VERDICT r2 item 8).

Both reduce P cell-sorted (P, 81) pair-product rows into U unique cells.
Run on the real TPU:  python scripts/ab_pallas_cells.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from gtsam_tpu.linear.pallas_kernels import (
        segmented_block_sum, segment_offsets_from_ids)
    from gtsam_tpu.sfm import ba, synthetic

    # ladybug-like cell-run profile
    prob = synthetic.make_bal_problem(num_cameras=256, num_points=20000,
                                      obs_per_point=4, seed=0)
    st, _ = ba.SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                    prob.num_cameras, prob.num_points)
    ia, ib, swap, diagp = st.sym_groups
    P = len(ia)
    U = len(st.sym_cells)
    rng = np.random.default_rng(0)
    prods = jnp.asarray(rng.normal(size=(P, 81)).astype(np.float32))
    print(f"P={P} pair rows -> U={U} cells on {jax.devices()[0]}",
          flush=True)

    # run boundaries for the pallas kernel (cells are sorted by construction)
    # rebuild seg ids from the bucket plan: bucket k covers rows [p0, p0+n*Pw)
    # with each run padded to Pw; instead use the unpadded sorted cell ids
    # bucket plan is in sym_cells (crun) order; the raw product rows are in
    # ascending-cell order — build the pallas offsets in ascending order and
    # remember the permutation to compare outputs
    lens = segment_offsets_from_ids_from_buckets(st)[:U]
    asc = np.argsort(np.asarray(st.sym_cells))
    offsets = np.concatenate([[0], np.cumsum(lens[asc])]).astype(np.int32)

    f_pallas = jax.jit(lambda p: segmented_block_sum(
        p, jnp.asarray(offsets), U))

    def bucket_reduce(p):
        ext = jnp.concatenate([p, jnp.zeros((1, 81), dtype=p.dtype)])
        gat = ext[jnp.asarray(st.sym_pad_idx)]
        return jnp.concatenate(
            [gat[p0:p0 + nr * Pw].reshape(nr, Pw, 81).sum(1)
             for (p0, nr, Pw) in st.sym_buckets])

    f_bucket = jax.jit(bucket_reduce)

    for name, f in (("pallas", f_pallas), ("sorted-run buckets", f_bucket)):
        try:
            out = f(prods)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(20):
                out = f(prods)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / 20
            print(f"{name:>20}: {dt*1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>20}: FAILED ({type(e).__name__}: {e})", flush=True)

    # numerics cross-check (bucket output reordered to ascending cells)
    a = np.asarray(f_bucket(prods))[asc]
    try:
        b = np.asarray(f_pallas(prods))
        print("max |diff| =", float(np.abs(a - b).max()), flush=True)
    except Exception:
        pass


def segment_offsets_from_ids_from_buckets(st):
    """Per-cell true run lengths from the pow2-padded bucket plan (bucket
    padding may append ghost runs past the true cell count)."""
    P = len(st.sym_groups[0])
    lens = []
    sent = P
    for (p0, nr, Pw) in st.sym_buckets:
        pad = np.asarray(st.sym_pad_idx[p0:p0 + nr * Pw]).reshape(nr, Pw)
        lens.extend((pad != sent).sum(axis=1).tolist())
    return np.asarray(lens)


if __name__ == "__main__":
    main()
