import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("GTSAM_TPU_NO_X64", "1")
import jax, jax.numpy as jnp, numpy as np

K = 600_000
Ns = 150_000
P = 2_400_000
key = jax.random.PRNGKey(0)
W = jax.random.normal(key, (K, 27), jnp.float32)
C = jax.random.normal(key, (Ns, 9), jnp.float32)
obs = jax.random.randint(key, (K,), 0, Ns)
pa = jax.random.randint(key, (P,), 0, K)
pb = jax.random.randint(key, (P,), 0, K)

def timeit(name, f, *a):
    r = jax.block_until_ready(jax.jit(f)(*a)); t0=time.time()
    for _ in range(3): r = jax.block_until_ready(jax.jit(f)(*a))
    print(f"{name:30s} {(time.time()-t0)/3*1000:8.1f} ms"); return r

# old: stack of 27 slices
def wc_old(W, C, obs):
    Ck = C[obs]
    return jnp.stack(
        [W[:, 3*i+0]*Ck[:, 0+l] + W[:, 3*i+1]*Ck[:, 3+l] + W[:, 3*i+2]*Ck[:, 6+l]
         for i in range(9) for l in range(3)], axis=-1)
# new: broadcast-reduce
def wc_new(W, C, obs):
    Ck = C[obs].reshape(K, 3, 3)
    W3 = W.reshape(K, 9, 3)
    return (W3[:, :, :, None] * Ck[:, None, :, :]).sum(2).reshape(K, 27)
# new2: batched matmul
def wc_mm(W, C, obs):
    Ck = C[obs].reshape(K, 3, 3)
    W3 = W.reshape(K, 9, 3)
    return jnp.einsum("kij,kjl->kil", W3, Ck).reshape(K, 27)

r1 = timeit("WC old (stack27)", wc_old, W, C, obs)
r2 = timeit("WC bcast-reduce", wc_new, W, C, obs)
r3 = timeit("WC einsum", wc_mm, W, C, obs)
print("agree:", float(jnp.max(jnp.abs(r1-r2))), float(jnp.max(jnp.abs(r1-r3))))

WC = r2
def pair_old(WC, W, pa, pb):
    iW = np.repeat(np.arange(9), 9); lW = np.tile(np.arange(9), 9)
    wc = WC[pa]; w = W[pb]
    acc = wc[:, 3*iW+0]*w[:, 3*lW+0]
    acc = acc + wc[:, 3*iW+1]*w[:, 3*lW+1]
    acc = acc + wc[:, 3*iW+2]*w[:, 3*lW+2]
    return acc
def pair_new(WC, W, pa, pb):
    wc = WC[pa].reshape(P, 9, 3); w = W[pb].reshape(P, 9, 3)
    return (wc[:, :, None, :] * w[:, None, :, :]).sum(-1).reshape(P, 81)
def pair_mm(WC, W, pa, pb):
    wc = WC[pa].reshape(P, 9, 3); w = W[pb].reshape(P, 9, 3)
    return jnp.einsum("pij,pqj->piq", wc, w).reshape(P, 81)
s1 = timeit("pair old", pair_old, WC, W, pa, pb)
s2 = timeit("pair bcast", pair_new, WC, W, pa, pb)
s3 = timeit("pair einsum", pair_mm, WC, W, pa, pb)
print("agree:", float(jnp.max(jnp.abs(s1-s2))), float(jnp.max(jnp.abs(s1-s3))))
# gather cost alone
def gonly(WC, pa): return WC[pa]
timeit("gather (P,27) alone", gonly, WC, pa)
