"""Micro-bench the cell-reduction components on TPU (vary inputs!)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")
import jax, jax.numpy as jnp
import numpy as np
from gtsam_tpu.sfm import ba, synthetic

prob = synthetic.make_bal_problem(num_cameras=1723, num_points=150000,
                                  obs_per_point=4, seed=0)
st, _ = ba.SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                prob.num_cameras, prob.num_points)
K = len(st.obs_cam)
P = len(st.pair_a)
rng = np.random.default_rng(0)
dt = jnp.float32
WC0 = jnp.asarray(rng.standard_normal((K, 27)), dt)
W0 = jnp.asarray(rng.standard_normal((K, 27)), dt)
pa = jnp.asarray(st.pair_a)
pb = jnp.asarray(st.pair_b)
perm = jnp.asarray(rng.permutation(P).astype(np.int32))


def timeit(name, fn, make_args, n=3):
    jax.block_until_ready(fn(*make_args(0)))
    ts = []
    for i in range(1, n + 1):
        a = make_args(i)
        t0 = time.time()
        jax.block_until_ready(fn(*a))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)


g1 = jax.jit(lambda wc: wc[pa])
timeit("gather (P,27) by pa", g1, lambda i: (WC0 + i * 1e-3,))
g2 = jax.jit(lambda wc, w: (wc[pa], w[pb]))
timeit("two gathers (P,27)", g2, lambda i: (WC0 + i * 1e-3, W0))

iW = np.repeat(np.arange(9), 9)
lW = np.tile(np.arange(9), 9)


@jax.jit
def prod_from_gathered(wc, w):
    a = wc[pa]
    b = w[pb]
    acc = a[:, 3 * iW + 0] * b[:, 3 * lW + 0]
    acc += a[:, 3 * iW + 1] * b[:, 3 * lW + 1]
    acc += a[:, 3 * iW + 2] * b[:, 3 * lW + 2]
    return acc


timeit("gather+product (P,81)", prod_from_gathered,
       lambda i: (WC0 + i * 1e-3, W0))

# track-order products via per-length-group einsum (NO gather);
# track groups (row0, n, l) over obs rows come straight from pt_groups
tg = st.pt_groups


@jax.jit
def prod_trackorder(WC, W):
    outs = []
    for (r0, n, l) in tg:
        wc = WC[r0:r0 + n * l].reshape(n, l, 9, 3)
        w = W[r0:r0 + n * l].reshape(n, l, 9, 3)
        pr = jnp.einsum("naij,nbkj->nabik", wc, w)     # (n, l, l, 9, 9)
        outs.append(pr.reshape(-1, 81))
    if st.pt_tail is not None:
        t0_, seg_ids, nseg = st.pt_tail
        pass  # tail ignored in micro-bench (tiny)
    return jnp.concatenate(outs)


timeit("track-order einsum products", prod_trackorder,
       lambda i: (WC0 + i * 1e-3, W0))

pr0 = jnp.asarray(rng.standard_normal((P, 81)), dt)
g81 = jax.jit(lambda p: p[perm])
timeit("gather (P,81) permute", g81, lambda i: (pr0 + i * 1e-3,))

# pure contiguous reduce of cell-ordered rows (the pow2 bucket reduce alone)
cells_of_pairs = st.obs_cam[st.pair_a].astype(np.int64) * st.num_cameras + \
    st.obs_cam[st.pair_b]
change = np.flatnonzero(np.diff(cells_of_pairs)) + 1
first = np.concatenate([[0], change])
counts = np.diff(np.concatenate([first, [P]]))
pad_idx, buckets, _ = ba._pow2_pad_plan(
    np.arange(P, dtype=np.int32), first, counts, sentinel=P)
pad_j = jnp.asarray(pad_idx)


@jax.jit
def reduce_only(prods):
    ext = jnp.concatenate([prods, jnp.zeros((1, 81), dtype=dt)])
    g = ext[pad_j]
    outs = [g[p0:p0 + n * Pw].reshape(n, Pw, 81).sum(1)
            for (p0, n, Pw) in buckets]
    return jnp.concatenate(outs)


timeit("pow2 gather+reduce (P,81)->cells", reduce_only,
       lambda i: (pr0 + i * 1e-3,))

# pallas segmented reduction over cell-ordered rows
from gtsam_tpu.linear import pallas_kernels as pk
offsets = pk.segment_offsets_from_ids(
    np.repeat(np.arange(len(counts)), counts), len(counts))
off_j = jnp.asarray(offsets)
U = len(counts)
pall = jax.jit(lambda p: pk.segmented_block_sum(p, off_j, U))
try:
    timeit("pallas segmented reduce", pall, lambda i: (pr0 + i * 1e-3,))
except Exception as e:
    print("pallas failed:", repr(e)[:200])
