import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")
import jax, jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())
n = 8192
x = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)), jnp.float32)
f = jax.jit(lambda a: jnp.linalg.cholesky(a @ a.T + n * jnp.eye(n, dtype=a.dtype)))
r = jax.block_until_ready(f(x))
for i in range(3):
    t0 = time.time()
    r = jax.block_until_ready(f(x))
    print(f"chol {n}: {(time.time()-t0)*1000:.1f} ms")

from gtsam_tpu.sfm import ba, synthetic
prob = synthetic.make_bal_problem(num_cameras=1723, num_points=150000,
                                  obs_per_point=4, seed=0)
st, order = ba.SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                    prob.num_cameras, prob.num_points)
K = len(st.obs_cam)
rng = np.random.default_rng(0)
A_cam = jnp.asarray(rng.standard_normal((K, 2, 9)), jnp.float32)
A_pt = jnp.asarray(rng.standard_normal((K, 2, 3)), jnp.float32)
b = jnp.asarray(rng.standard_normal((K, 2)), jnp.float32)
full = jax.jit(lambda ac, ap, bb: ba.schur_solve(st, ac, ap, bb, 1e-4,
                                                 mixed_precision=True))
t0 = time.time()
out = jax.block_until_ready(full(A_cam, A_pt, b))
print(f"full compile+run: {time.time()-t0:.1f}s")
print("dc[0]:", np.asarray(out[0][0])[:3])
for i in range(3):
    t0 = time.time()
    out = jax.block_until_ready(full(A_cam, A_pt, b + i * 0.001))
    print(f"full schur_solve (fresh rhs): {(time.time()-t0)*1000:.1f} ms")
