import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")
import jax, jax.numpy as jnp, numpy as np
from gtsam_tpu.sfm import bal, synthetic
from gtsam_tpu.sfm.ba import (SchurStructure, _grouped_reduce, _I93, _J93)
from gtsam_tpu.graph import factors as factors_mod
from gtsam_tpu.base import noise as noise_mod
from gtsam_tpu.geometry.cameras import BalCamera
from gtsam_tpu.geometry.se3 import SE3

prob = synthetic.make_bal_problem(num_cameras=1723, num_points=150000, obs_per_point=4, seed=0)
st, order = SchurStructure.build(prob.obs_cam, prob.obs_pt, prob.num_cameras, prob.num_points)
K = len(st.obs_cam)
Ns = int(st.obs_pt_new[-1]) + 1
P = len(st.pair_a)
print(f"K={K} Ns={Ns} P={P}", flush=True)
key = jax.random.PRNGKey(0)
W = jax.random.normal(key, (K, 27), jnp.float32)
WC = jax.random.normal(key, (K, 27), jnp.float32)
C = jax.random.normal(key, (Ns, 9), jnp.float32)
gl = jax.random.normal(key, (Ns, 3), jnp.float32)
obs_pt_new = jnp.asarray(st.obs_pt_new)

def timeit(name, f, *a):
    r = jax.block_until_ready(jax.jit(f)(*a)); t0=time.time()
    for _ in range(5): r = jax.block_until_ready(jax.jit(f)(*a))
    print(f"{name:34s} {(time.time()-t0)/5*1000:8.1f} ms", flush=True); return r

# --- the two K-gathers in stage3
def g2(C, gl):
    Cg = jnp.stack([(C[:, 3*i:3*i+3] * gl).sum(-1) for i in range(3)], axis=-1)
    return C[obs_pt_new], Cg[obs_pt_new]
timeit("2 gathers K-row (Ck, Cgk)", g2, C, gl)
def g1(C, gl):
    Cg = jnp.stack([(C[:, 3*i:3*i+3] * gl).sum(-1) for i in range(3)], axis=-1)
    both = jnp.concatenate([C, Cg], axis=1)[obs_pt_new]
    return both[:, :9], both[:, 9:]
timeit("1 fused gather K-row (12 lanes)", g1, C, gl)

# --- pair rows: gather-based (current) vs track-major
iW = np.repeat(np.arange(9), 9); lW = np.tile(np.arange(9), 9)
pa_all = jnp.asarray(st.pair_a); pb_all = jnp.asarray(st.pair_b)
def pairs_gather(WC, W):
    wc = WC[pa_all]; w = W[pb_all]
    acc = wc[:, 3*iW+0]*w[:, 3*lW+0]
    acc = acc + wc[:, 3*iW+1]*w[:, 3*lW+1]
    acc = acc + wc[:, 3*iW+2]*w[:, 3*lW+2]
    return acc.sum()  # avoid (P,81) output alloc influencing too much
timeit("pair rows via 2 gathers", pairs_gather, WC, W)

# track-major: per length group, products from contiguous slabs (no gather)
def pairs_trackmajor(WC, W):
    tot = 0.0
    for (r0, n, l) in st.pt_groups:
        wc = WC[r0:r0+n*l].reshape(n, l, 27)
        w = W[r0:r0+n*l].reshape(n, l, 27)
        acc = (wc[:, :, None, 3*iW+0] * w[:, None, :, 3*lW+0])
        acc = acc + (wc[:, :, None, 3*iW+1] * w[:, None, :, 3*lW+1])
        acc = acc + (wc[:, :, None, 3*iW+2] * w[:, None, :, 3*lW+2])
        tot = tot + acc.sum()
    return tot
timeit("pair rows track-major (no gather)", pairs_trackmajor, WC, W)
