"""Complete stage profile, memory-careful, fresh inputs each call."""
import os, sys, time, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")
import jax, jax.numpy as jnp
import numpy as np
from gtsam_tpu.sfm import ba, synthetic

prob = synthetic.make_bal_problem(num_cameras=1723, num_points=150000,
                                  obs_per_point=4, seed=0)
st, _ = ba.SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                prob.num_cameras, prob.num_points)
M, N = st.num_cameras, st.num_points
K = len(st.obs_cam)
rng = np.random.default_rng(0)
dt = jnp.float32
Ns = int(st.obs_pt_new[-1]) + 1


def timeit(name, fn, make_args, n=3):
    jax.block_until_ready(fn(*make_args(0)))
    ts = []
    for i in range(1, n + 1):
        a = make_args(i)
        t0 = time.time()
        jax.block_until_ready(fn(*a))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)


A_cam0 = jnp.asarray(rng.standard_normal((K, 2, 9)), dt)
A_pt0 = jnp.asarray(rng.standard_normal((K, 2, 3)), dt)
b0 = jnp.asarray(rng.standard_normal((K, 2)), dt)
W0 = jnp.asarray(rng.standard_normal((K, 27)), dt)
C0 = jnp.asarray(rng.standard_normal((Ns, 9)), dt)
gl0 = jnp.asarray(rng.standard_normal((Ns, 3)), dt)
obs_pt_new = jnp.asarray(st.obs_pt_new)
seg_cam = jnp.asarray(st.obs_cam)

stage_W = jax.jit(lambda A_cam, A_pt:
                  (A_cam[:, :, ba._I93] * A_pt[:, :, ba._J93]).sum(1))
timeit("W couple (K,27)", stage_W, lambda i: (A_cam0 + i * 1e-3, A_pt0))


@jax.jit
def stage_corr(W, C, gl):
    Cg = jnp.stack([(C[:, 3 * i:3 * i + 3] * gl).sum(-1)
                    for i in range(3)], axis=-1)
    Cgk = Cg[obs_pt_new]
    corr = jnp.stack([(W[:, 3 * i:3 * i + 3] * Cgk).sum(-1)
                      for i in range(9)], axis=-1)
    return ba._padded_reduce(corr, st.cam_pad_idx, st.cam_buckets, M,
                             st.cam_ids)


timeit("corr gp_t (gather Ns->K + cam reduce)", stage_corr,
       lambda i: (W0 + i * 1e-3, C0, gl0))


@jax.jit
def stage_WC(W, C):
    Ck = C[obs_pt_new]
    return jnp.stack(
        [W[:, 3 * i + 0] * Ck[:, 0 + l] + W[:, 3 * i + 1] * Ck[:, 3 + l]
         + W[:, 3 * i + 2] * Ck[:, 6 + l]
         for i in range(9) for l in range(3)], axis=-1)


timeit("WC (K,27)", stage_WC, lambda i: (W0 + i * 1e-3, C0))

U = len(st.cell_unique)
cs0 = jnp.asarray(rng.standard_normal((U, 81)), dt)
Hpp0 = jnp.asarray(rng.standard_normal((M, 81)), dt)
cell_unique_j = jnp.asarray(st.cell_unique)


@jax.jit
def stage_assemble(cellsum, Hpp):
    Sflat = jnp.zeros((M * M, 81), dtype=dt)
    Sflat = Sflat.at[cell_unique_j].set(-cellsum)
    diag_idx = jnp.arange(M, dtype=jnp.int32)
    Hpp_d = Hpp.reshape(M, 9, 9) + 1e-4 * jnp.eye(9, dtype=dt)
    Sflat = Sflat.at[diag_idx * (M + 1)].add(Hpp_d.reshape(M, 81))
    return jnp.transpose(Sflat.reshape(M, M, 9, 9), (0, 2, 1, 3)).reshape(
        9 * M, 9 * M)


S = stage_assemble(cs0, Hpp0)
timeit("S assemble", stage_assemble, lambda i: (cs0 + i * 1e-3, Hpp0))

gv0 = jnp.asarray(rng.standard_normal((9 * M,)), dt)
solve = jax.jit(lambda S, g: ba._dense_spd_solve(S, g, True))
timeit("dense solve 15507 (mixed)", solve, lambda i: (S, gv0 + i * 1e-3))

dc0 = jnp.asarray(rng.standard_normal((M, 9)), dt)


@jax.jit
def stage_backsub(dc, W, C, gl):
    dck = dc[seg_cam]
    Wt_dc = jnp.stack([(W[:, ba._J93 == j] * dck).sum(-1)
                       for j in range(3)], axis=-1)
    rhs_l = gl - ba._grouped_reduce(Wt_dc, st.pt_groups, st.pt_tail)
    dl_new = jnp.stack([(C[:, 3 * i:3 * i + 3] * rhs_l).sum(-1)
                        for i in range(3)], axis=-1)
    dl = jnp.zeros((N, 3), dtype=dt)
    return dl.at[jnp.asarray(st.point_perm[:Ns])].set(dl_new)


timeit("landmark backsub", stage_backsub,
       lambda i: (dc0 + i * 1e-3, W0, C0, gl0))

# linearize cost
from gtsam_tpu.sfm import bal as bal_mod
from gtsam_tpu.graph import factors as factors_mod
from gtsam_tpu.base import noise as noise_mod
from gtsam_tpu.geometry.cameras import BalCamera
from gtsam_tpu.geometry.se3 import SE3

st2, order = st, None
uv = jnp.asarray(rng.standard_normal((K, 2)), dt)
batch = factors_mod.custom_factors(
    "ProjectionBal", ("BalCamera", "Point3"),
    np.zeros((K, 2), dtype=np.int64),
    bal_mod._projection_residual, 2, uv, noise_mod.unit())
cams = BalCamera(SE3(jnp.asarray(prob.cam_R, dt), jnp.asarray(prob.cam_t, dt)),
                 jnp.asarray(prob.cam_calib, dt))
pts = jnp.asarray(prob.points, dt)
obs_cam_j = jnp.asarray(st.obs_cam)
obs_pt_j = jnp.asarray(st.obs_pt)


@jax.jit
def stage_linearize(cams, pts):
    cam_k = jax.tree.map(lambda a: a[obs_cam_j], cams)
    pt_k = pts[obs_pt_j]
    return factors_mod.linearize(batch, (cam_k, pt_k))


timeit("linearize (jacfwd 550k obs)", stage_linearize,
       lambda i: (jax.tree.map(lambda a: a + i * 1e-5, cams), pts))
