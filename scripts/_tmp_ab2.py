import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")
import jax, jax.numpy as jnp, numpy as np

K = 600_000; Ns = 150_000; P = 2_400_000
key = jax.random.PRNGKey(0)
W = jax.random.normal(key, (K, 27), jnp.float32)
A = jax.random.normal(key, (Ns, 3, 3), jnp.float32)
H = jnp.einsum("nij,nkj->nik", A, A) + 0.1*jnp.eye(3)
pa = jax.random.randint(key, (P,), 0, K)

def timeit(name, f, *a):
    r = jax.block_until_ready(jax.jit(f)(*a)); t0=time.time()
    for _ in range(3): r = jax.block_until_ready(jax.jit(f)(*a))
    print(f"{name:30s} {(time.time()-t0)/3*1000:8.1f} ms", flush=True); return r

def inv_lu(H): return jnp.linalg.inv(H + 1e-4*jnp.eye(3))
def inv_cf(H):
    Hd = H + 1e-4*jnp.eye(3)
    # flat closed-form adjugate inverse, (N,9) lanes
    h = Hd.reshape(-1, 9)
    a,b,c,d,e,f,g,hh,i = [h[:, k] for k in range(9)]
    A_ = e*i-f*hh; B_ = c*hh-b*i; C_ = b*f-c*e
    D_ = f*g-d*i; E_ = a*i-c*g; F_ = c*d-a*f
    G_ = d*hh-e*g; H_ = b*g-a*hh; I_ = a*e-b*d
    det = a*A_ + b*D_ + c*G_
    inv = jnp.stack([A_,B_,C_,D_,E_,F_,G_,H_,I_], axis=-1) / det[:, None]
    return inv.reshape(-1, 3, 3)
r1 = timeit("inv 3x3 LU", inv_lu, H)
r2 = timeit("inv 3x3 closed-form", inv_cf, H)
print("agree:", float(jnp.max(jnp.abs(r1-r2))), flush=True)
def gonly(W, pa): return W[pa].sum()
timeit("gather (P,27) + sum", gonly, W, pa)
def gonly81(W, pa): return jnp.concatenate([W, W, W], 1)[pa].sum()
timeit("gather (P,81) + sum", gonly81, W, pa)
