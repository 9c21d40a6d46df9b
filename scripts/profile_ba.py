"""Stage-by-stage profile of one BA GN step at Ladybug-1723 scale on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_tpu.geometry.cameras import BalCamera
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.sfm import ba, synthetic

SCALE = os.environ.get("BENCH_SCALE", "ladybug")
if SCALE == "small":
    M, N, OPP = 100, 5000, 4
else:
    M, N, OPP = 1723, 150000, 4

prob = synthetic.make_bal_problem(num_cameras=M, num_points=N,
                                  obs_per_point=OPP, seed=0)
print(f"cams={prob.num_cameras} pts={prob.num_points} obs={prob.num_observations}")

t0 = time.time()
st, order = ba.SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                    prob.num_cameras, prob.num_points)
print(f"structure build: {time.time()-t0:.2f}s  pairs={len(st.pair_a)} "
      f"cells={len(st.cell_unique)} pt_groups={len(st.pt_groups)} "
      f"cell_groups={len(st.cell_groups)} cam_buckets={len(st.cam_buckets)}")

dt = jnp.float32
K = len(st.obs_cam)
rng = np.random.default_rng(0)
A_cam = jnp.asarray(rng.standard_normal((K, 2, 9)), dtype=dt)
A_pt = jnp.asarray(rng.standard_normal((K, 2, 3)), dtype=dt)
b = jnp.asarray(rng.standard_normal((K, 2)), dtype=dt)


def timeit(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    n = 3
    for _ in range(n):
        r = jax.block_until_ready(fn(*args))
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms")
    return r


full = jax.jit(lambda ac, ap, bb: ba.schur_solve(st, ac, ap, bb, 1e-4,
                                                 mixed_precision=True))
t0 = time.time()
jax.block_until_ready(full(A_cam, A_pt, b))
print(f"full schur_solve compile+run: {time.time()-t0:.1f}s")
timeit("full schur_solve", full, A_cam, A_pt, b)

# stage breakdown
obs_pt_new = jnp.asarray(st.obs_pt_new)
Ns = int(st.obs_pt_new[-1]) + 1


@jax.jit
def stage_pt(A_pt, b):
    hll_k = (A_pt[:, :, ba._I3] * A_pt[:, :, ba._J3]).sum(1)
    gl_k = jnp.einsum("kri,kr->ki", A_pt, b)
    Hll = ba._grouped_reduce(hll_k, st.pt_groups, st.pt_tail)
    gl = ba._grouped_reduce(gl_k, st.pt_groups, st.pt_tail)
    return Hll, gl


@jax.jit
def stage_cam(A_cam, b):
    hpp_k = (A_cam[:, :, ba._I9] * A_cam[:, :, ba._J9]).sum(1)
    gp_k = jnp.einsum("kri,kr->ki", A_cam, b)
    red = ba._padded_reduce(jnp.concatenate([hpp_k, gp_k], axis=1),
                            st.cam_pad_idx, st.cam_buckets, M, st.cam_ids)
    return red


@jax.jit
def stage_W(A_cam, A_pt):
    return (A_cam[:, :, ba._I93] * A_pt[:, :, ba._J93]).sum(1)


Hll, gl = timeit("pt reduce", stage_pt, A_pt, b)
timeit("cam reduce", stage_cam, A_cam, b)
W = timeit("W couple", stage_W, A_cam, A_pt)

C = jnp.asarray(rng.standard_normal((Ns, 9)), dtype=dt)
WC = jnp.asarray(rng.standard_normal((K, 27)), dtype=dt)

iW = np.repeat(np.arange(9), 9)
lW = np.tile(np.arange(9), 9)
pa_all = jnp.asarray(st.pair_a)
pb_all = jnp.asarray(st.pair_b)


@jax.jit
def stage_cells(WC, W):
    def _pair_rows(sl):
        wc = WC[pa_all[sl]]
        w = W[pb_all[sl]]
        acc = wc[:, 3 * iW + 0] * w[:, 3 * lW + 0]
        acc = acc + wc[:, 3 * iW + 1] * w[:, 3 * lW + 1]
        acc = acc + wc[:, 3 * iW + 2] * w[:, 3 * lW + 2]
        return acc

    CHUNK = 1 << 17
    cell_parts = []
    for (p0, n, l) in st.cell_groups:
        ncell_chunk = max(1, CHUNK // l)
        subs = []
        for c0 in range(0, n, ncell_chunk):
            nc = min(ncell_chunk, n - c0)
            sl = slice(p0 + c0 * l, p0 + (c0 + nc) * l)
            subs.append(_pair_rows(sl).reshape(nc, l, 81).sum(1))
        cell_parts.append(jnp.concatenate(subs) if len(subs) > 1 else subs[0])
    if st.cell_tail is not None:
        t0_, seg_ids, nseg = st.cell_tail
        acc = jnp.zeros((nseg, 81), dtype=dt)
        P_tail = len(st.pair_a) - t0_
        for c0 in range(0, P_tail, CHUNK):
            sl = slice(t0_ + c0, t0_ + min(c0 + CHUNK, P_tail))
            acc = acc + jax.ops.segment_sum(
                _pair_rows(sl), jnp.asarray(seg_ids[c0:c0 + CHUNK]), nseg)
        cell_parts.append(acc)
    return jnp.concatenate(cell_parts) if len(cell_parts) > 1 else cell_parts[0]


t0 = time.time()
jax.block_until_ready(stage_cells(WC, W))
print(f"cells compile+run: {time.time()-t0:.1f}s")
cellsum = timeit("cell reduce", stage_cells, WC, W)

U = len(st.cell_unique)


@jax.jit
def stage_assemble(cellsum, Hpp):
    Sflat = jnp.zeros((M * M, 81), dtype=dt)
    Sflat = Sflat.at[jnp.asarray(st.cell_unique)].set(-cellsum)
    diag_idx = jnp.arange(M, dtype=jnp.int32)
    Hpp_d = Hpp.reshape(M, 9, 9) + 1e-4 * jnp.eye(9, dtype=dt)
    Sflat = Sflat.at[diag_idx * M + diag_idx].add(Hpp_d.reshape(M, 81))
    return jnp.transpose(Sflat.reshape(M, M, 9, 9), (0, 2, 1, 3)).reshape(
        9 * M, 9 * M)


Hpp = jnp.asarray(rng.standard_normal((M, 81)), dtype=dt)
S = timeit("S assemble", stage_assemble, cellsum, Hpp)

gp_t = jnp.asarray(rng.standard_normal((9 * M,)), dtype=dt)
solve = jax.jit(lambda S, g: ba._dense_spd_solve(S, g, True))
timeit("dense solve", solve, S, gp_t)
