"""Stage profile with INPUT VARIATION (axon memoizes identical-input calls)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")
import jax, jax.numpy as jnp
import numpy as np
from gtsam_tpu.sfm import ba, synthetic

prob = synthetic.make_bal_problem(num_cameras=1723, num_points=150000,
                                  obs_per_point=4, seed=0)
st, order = ba.SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                    prob.num_cameras, prob.num_points)
M, N = st.num_cameras, st.num_points
K = len(st.obs_cam)
P = len(st.pair_a)
rng = np.random.default_rng(0)
dt = jnp.float32


def timeit(name, fn, make_args, n=3):
    jax.block_until_ready(fn(*make_args(0)))
    ts = []
    for i in range(1, n + 1):
        a = make_args(i)
        t0 = time.time()
        jax.block_until_ready(fn(*a))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms")


W0 = jnp.asarray(rng.standard_normal((K, 27)), dt)
WC0 = jnp.asarray(rng.standard_normal((K, 27)), dt)

iW = np.repeat(np.arange(9), 9)
lW = np.tile(np.arange(9), 9)
pa_all = jnp.asarray(st.pair_a)
pb_all = jnp.asarray(st.pair_b)
U = len(st.cell_unique)

# -- variant A: current grouped/chunked cell reduce -------------------------

def _pair_rows(WC, W, sl):
    wc = WC[pa_all[sl]]
    w = W[pb_all[sl]]
    acc = wc[:, 3 * iW + 0] * w[:, 3 * lW + 0]
    acc = acc + wc[:, 3 * iW + 1] * w[:, 3 * lW + 1]
    acc = acc + wc[:, 3 * iW + 2] * w[:, 3 * lW + 2]
    return acc


@jax.jit
def cells_grouped(WC, W):
    CHUNK = 1 << 17
    parts = []
    for (p0, n, l) in st.cell_groups:
        ncc = max(1, CHUNK // l)
        subs = []
        for c0 in range(0, n, ncc):
            nc = min(ncc, n - c0)
            sl = slice(p0 + c0 * l, p0 + (c0 + nc) * l)
            subs.append(_pair_rows(WC, W, sl).reshape(nc, l, 81).sum(1))
        parts.append(jnp.concatenate(subs) if len(subs) > 1 else subs[0])
    if st.cell_tail is not None:
        t0_, seg_ids, nseg = st.cell_tail
        acc = jnp.zeros((nseg, 81), dtype=dt)
        Pt = P - t0_
        for c0 in range(0, Pt, CHUNK):
            sl = slice(t0_ + c0, t0_ + min(c0 + CHUNK, Pt))
            acc = acc + jax.ops.segment_sum(
                _pair_rows(WC, W, sl), jnp.asarray(seg_ids[c0:c0 + CHUNK]), nseg)
        parts.append(acc)
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


# -- variant B: pow2-padded pair reduce (one gather, log2 reshape-sums) -----

cells = st.obs_cam[st.pair_a].astype(np.int64) * M + st.obs_cam[st.pair_b]
cell_sorted = np.sort(np.unique(cells))
# recover run boundaries over the already-cell-sorted pair arrays
cu, cfirst, ccounts = np.unique(
    st.obs_cam[st.pair_a].astype(np.int64) * M + st.obs_cam[st.pair_b],
    return_counts=True, return_index=False)[0], None, None
# pairs are already sorted by cell per SchurStructure.build
cells_of_pairs = st.obs_cam[st.pair_a].astype(np.int64) * M + \
    st.obs_cam[st.pair_b]
change = np.flatnonzero(np.diff(cells_of_pairs)) + 1
first = np.concatenate([[0], change])
counts = np.diff(np.concatenate([first, [P]]))
pad_idx, buckets, run_order = ba._pow2_pad_plan(
    np.arange(P, dtype=np.int32), first, counts, sentinel=P)
print(f"pow2 plan: {len(buckets)} buckets, R={len(pad_idx)} (P={P}, x{len(pad_idx)/P:.2f})")
pa_pad = np.concatenate([st.pair_a, [0]])[pad_idx]
pb_pad = np.concatenate([st.pair_b, [0]])[pad_idx]
pad_mask = (pad_idx == P)
pa_pad_j = jnp.asarray(pa_pad)
pb_pad_j = jnp.asarray(pb_pad)
mask_j = jnp.asarray(~pad_mask, dtype=dt)[:, None]


@jax.jit
def cells_pow2(WC, W):
    wc = WC[pa_pad_j] * mask_j
    w = W[pb_pad_j]
    acc = wc[:, 3 * iW + 0] * w[:, 3 * lW + 0]
    acc = acc + wc[:, 3 * iW + 1] * w[:, 3 * lW + 1]
    acc = acc + wc[:, 3 * iW + 2] * w[:, 3 * lW + 2]
    outs = [acc[p0:p0 + n * Pw].reshape(n, Pw, 81).sum(1)
            for (p0, n, Pw) in buckets]
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def args_i(i):
    return (WC0 + i * 1e-3, W0 + i * 1e-3)


t0 = time.time()
rA = jax.block_until_ready(cells_grouped(*args_i(0)))
print(f"grouped compile: {time.time()-t0:.1f}s")
timeit("cells grouped", cells_grouped, args_i)

t0 = time.time()
rB = jax.block_until_ready(cells_pow2(*args_i(0)))
print(f"pow2 compile: {time.time()-t0:.1f}s")
timeit("cells pow2", cells_pow2, args_i)

# numerical agreement (bucket order of B vs group order of A differ; compare sums)
print("sum match:", float(jnp.abs(rA.sum(0) - rB.sum(0)).max()))

# -- other stages with fresh inputs -----------------------------------------

obs_pt_new = jnp.asarray(st.obs_pt_new)


@jax.jit
def stage_pt(A_pt, b):
    hll_k = (A_pt[:, :, ba._I3] * A_pt[:, :, ba._J3]).sum(1)
    gl_k = jnp.einsum("kri,kr->ki", A_pt, b)
    return (ba._grouped_reduce(hll_k, st.pt_groups, st.pt_tail),
            ba._grouped_reduce(gl_k, st.pt_groups, st.pt_tail))


@jax.jit
def stage_cam(A_cam, b):
    hpp_k = (A_cam[:, :, ba._I9] * A_cam[:, :, ba._J9]).sum(1)
    gp_k = jnp.einsum("kri,kr->ki", A_cam, b)
    return ba._padded_reduce(jnp.concatenate([hpp_k, gp_k], axis=1),
                             st.cam_pad_idx, st.cam_buckets, M, st.cam_ids)


A_cam0 = jnp.asarray(rng.standard_normal((K, 2, 9)), dt)
A_pt0 = jnp.asarray(rng.standard_normal((K, 2, 3)), dt)
b0 = jnp.asarray(rng.standard_normal((K, 2)), dt)
timeit("pt reduce", stage_pt, lambda i: (A_pt0 + i * 1e-3, b0))
timeit("cam reduce", stage_cam, lambda i: (A_cam0 + i * 1e-3, b0))

Sd = jnp.asarray(rng.standard_normal((9 * M, 9 * M)), dt)
Sd = Sd @ Sd.T + 9 * M * jnp.eye(9 * M, dtype=dt)
gv = jnp.asarray(rng.standard_normal((9 * M,)), dt)
solve = jax.jit(lambda S, g: ba._dense_spd_solve(S, g, True))
timeit("dense solve 15507", solve, lambda i: (Sd, gv + i * 1e-3))

cell_unique_j = jnp.asarray(st.cell_unique)
Hpp0 = jnp.asarray(rng.standard_normal((M, 81)), dt)


@jax.jit
def stage_assemble(cellsum, Hpp):
    Sflat = jnp.zeros((M * M, 81), dtype=dt)
    Sflat = Sflat.at[cell_unique_j].set(-cellsum)
    diag_idx = jnp.arange(M, dtype=jnp.int32)
    Hpp_d = Hpp.reshape(M, 9, 9) + 1e-4 * jnp.eye(9, dtype=dt)
    Sflat = Sflat.at[diag_idx * (M + 1)].add(Hpp_d.reshape(M, 81))
    return jnp.transpose(Sflat.reshape(M, M, 9, 9), (0, 2, 1, 3)).reshape(
        9 * M, 9 * M)


cs0 = jnp.asarray(rng.standard_normal((U, 81)), dt)
timeit("S assemble", stage_assemble, lambda i: (cs0 + i * 1e-3, Hpp0))
