import os, time
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import gtsam_tpu as gt
from gtsam_tpu.sfm import ba, bal, synthetic
from gtsam_tpu.sfm.ba import (SchurStructure, _grouped_reduce, _padded_reduce,
                              _invert_3x3_psd, _dense_spd_solve, _I9, _J9, _I3, _J3, _I93, _J93)
from gtsam_tpu.geometry.cameras import BalCamera
from gtsam_tpu.geometry.se3 import SE3
from gtsam_tpu.graph import factors as factors_mod
from gtsam_tpu.base import noise as noise_mod

prob = synthetic.make_bal_problem(num_cameras=1723, num_points=150000, obs_per_point=4, seed=0)
st, order = SchurStructure.build(prob.obs_cam, prob.obs_pt, prob.num_cameras, prob.num_points)
uv = jnp.asarray(prob.obs_uv[order], dtype=jnp.float32)
batch = factors_mod.custom_factors("ProjectionBal", ("BalCamera","Point3"),
    np.zeros((len(st.obs_cam),2), dtype=np.int64), bal._projection_residual, 2, uv, noise_mod.unit())
obs_cam = jnp.asarray(st.obs_cam); obs_pt = jnp.asarray(st.obs_pt)
cams = BalCamera(SE3(jnp.asarray(prob.cam_R, jnp.float32), jnp.asarray(prob.cam_t, jnp.float32)),
                 jnp.asarray(prob.cam_calib, jnp.float32))
pts = jnp.asarray(prob.points, jnp.float32)

@jax.jit
def linearize_fn(cams, pts):
    cam_k = jax.tree.map(lambda a: a[obs_cam], cams); pt_k = pts[obs_pt]
    return factors_mod.linearize(batch, (cam_k, pt_k))

(A_cam, A_pt), b = jax.block_until_ready(linearize_fn(cams, pts))
M, N = st.num_cameras, st.num_points
lam = 1e-4

def timeit(name, f, *a):
    r = jax.block_until_ready(jax.jit(f)(*a))
    t0=time.time()
    for _ in range(3): r = jax.block_until_ready(jax.jit(f)(*a))
    print(f"{name:28s} {(time.time()-t0)/3*1000:8.1f} ms")
    return r

timeit("linearize", lambda c,p: linearize_fn(c,p), cams, pts)

def stage1(A_pt, b):
    hll_k = (A_pt[:, :, _I3] * A_pt[:, :, _J3]).sum(1)
    gl_k = jnp.einsum("kri,kr->ki", A_pt, b)
    return (_grouped_reduce(hll_k, st.pt_groups, st.pt_tail),
            _grouped_reduce(gl_k, st.pt_groups, st.pt_tail))
Hll, gl = timeit("pt reduce (Hll,gl)", stage1, A_pt, b)

def stage2(A_cam, b):
    hpp_k = (A_cam[:, :, _I9] * A_cam[:, :, _J9]).sum(1)
    gp_k = jnp.einsum("kri,kr->ki", A_cam, b)
    red = _padded_reduce(jnp.concatenate([hpp_k, gp_k], axis=1), st.cam_pad_idx, st.cam_buckets, M, st.cam_ids)
    return red[:, :81], red[:, 81:]
Hpp, gp = timeit("cam reduce (Hpp,gp)", stage2, A_cam, b)

def stage3(A_cam, A_pt, Hll, gl):
    obs_pt_new = jnp.asarray(st.obs_pt_new)
    W = (A_cam[:, :, _I93] * A_pt[:, :, _J93]).sum(1)
    C = _invert_3x3_psd(Hll.reshape(-1,3,3), lam).reshape(-1,9)
    Cg = jnp.stack([(C[:, 3*i:3*i+3] * gl).sum(-1) for i in range(3)], axis=-1)
    Cgk = Cg[obs_pt_new]
    corr = jnp.stack([(W[:, 3*i:3*i+3] * Cgk).sum(-1) for i in range(9)], axis=-1)
    Ck = C[obs_pt_new]
    WC = jnp.stack([W[:, 3*i+0]*Ck[:, 0+l] + W[:, 3*i+1]*Ck[:, 3+l] + W[:, 3*i+2]*Ck[:, 6+l]
                    for i in range(9) for l in range(3)], axis=-1)
    return W, C, corr, WC
W_, C_, corr_, WC_ = timeit("W,C,corr,WC", stage3, A_cam, A_pt, Hll, gl)

def stage4(corr, gp):
    return gp - _padded_reduce(corr, st.cam_pad_idx, st.cam_buckets, M, st.cam_ids)
gp_t = timeit("corr cam reduce", stage4, corr_, gp)

iW = np.repeat(np.arange(9), 9); lW = np.tile(np.arange(9), 9)
pa_all = jnp.asarray(st.pair_a); pb_all = jnp.asarray(st.pair_b)
def stage5(WC, W):
    def _pair_rows(sl):
        wc = WC[pa_all[sl]]; w = W[pb_all[sl]]
        acc = wc[:, 3*iW+0]*w[:, 3*lW+0]
        acc = acc + wc[:, 3*iW+1]*w[:, 3*lW+1]
        acc = acc + wc[:, 3*iW+2]*w[:, 3*lW+2]
        return acc
    CHUNK = 1<<17
    parts=[]
    for (p0,n,l) in st.cell_groups:
        nc_chunk = max(1, CHUNK//l); subs=[]
        for c0 in range(0,n,nc_chunk):
            nc=min(nc_chunk,n-c0); sl=slice(p0+c0*l, p0+(c0+nc)*l)
            subs.append(_pair_rows(sl).reshape(nc,l,81).sum(1))
        parts.append(jnp.concatenate(subs) if len(subs)>1 else subs[0])
    if st.cell_tail is not None:
        t0_,seg_ids,nseg = st.cell_tail
        acc = jnp.zeros((nseg,81), jnp.float32)
        P_tail = len(st.pair_a)-t0_
        for c0 in range(0,P_tail,CHUNK):
            sl=slice(t0_+c0, t0_+min(c0+CHUNK,P_tail))
            acc = acc + jax.ops.segment_sum(_pair_rows(sl), jnp.asarray(seg_ids[c0:c0+CHUNK]), nseg)
        parts.append(acc)
    return jnp.concatenate(parts) if len(parts)>1 else parts[0]
cellsum = timeit("pair-product cell reduce", stage5, WC_, W_)

def stage6(cellsum, Hpp):
    Sflat = jnp.zeros((M*M,81), jnp.float32)
    Sflat = Sflat.at[jnp.asarray(st.cell_unique)].set(-cellsum)
    diag_idx = jnp.arange(M, dtype=jnp.int32)
    Hpp_d = Hpp.reshape(M,9,9) + lam*jnp.eye(9, dtype=jnp.float32)
    Sflat = Sflat.at[diag_idx*M+diag_idx].add(Hpp_d.reshape(M,81))
    return jnp.transpose(Sflat.reshape(M,M,9,9),(0,2,1,3)).reshape(9*M,9*M)
S = timeit("S assembly", stage6, cellsum, Hpp)

def stage7(S, gp_t):
    return _dense_spd_solve(S, gp_t.reshape(-1), False)
dc = timeit("dense chol solve", stage7, S, gp_t)
print("num pairs", len(st.pair_a), "num cells", len(st.cell_unique), "cell groups", len(st.cell_groups), "tail", st.cell_tail is not None)
