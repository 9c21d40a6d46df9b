"""Per-stage TPU profile of the sphere2500 supernodal LM iteration."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault('GTSAM_TPU_NO_X64', '1')
import numpy as np
import jax, jax.numpy as jnp
import gtsam_tpu as gt
from gtsam_tpu.io import datasets
from gtsam_tpu.linear.supernodal import SupernodalCholeskySolver

def timed(fn, *a, n=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return out, (time.time() - t0) / n

def main():
    graph, initial = datasets.load_3d(datasets.find_example_data('sphere2500.txt'))
    k0 = sorted(initial.keys['SE3'])[0]
    graph.add(gt.prior_factors('SE3', [k0], gt.SE3(np.eye(3)[None], np.zeros((1, 3))),
                               gt.noise.sigmas([[1e-4] * 6])))
    bound = graph.bind(initial)
    arrays = initial.arrays
    t0 = time.time()
    sup = SupernodalCholeskySolver(bound)
    print(f'symbolic+plans: {time.time()-t0:.2f}s  nsuper={sup.sym.nsuper} '
          f'nlev={len(sup.level_plans)} blocks={sup.B}', flush=True)

    err = jax.jit(bound.error)
    sysf = jax.jit(sup.system)
    facf = jax.jit(lambda b: sup.factorize(b, 1e-5))
    solf = jax.jit(sup.solve_factored)

    _, t_err = timed(err, arrays); print(f'error: {t_err*1e3:.1f} ms', flush=True)
    (blocks, g), t_sys = timed(sysf, arrays); print(f'system (linearize+assemble): {t_sys*1e3:.1f} ms', flush=True)
    fac, t_fac = timed(facf, blocks); print(f'factorize: {t_fac*1e3:.1f} ms', flush=True)
    _, t_sol = timed(solf, fac, g); print(f'solve (fwd+bwd): {t_sol*1e3:.1f} ms', flush=True)
    from gtsam_tpu.graph.values import retract_arrays
    layout = initial.layout()
    dx = solf(fac, g)
    ret = jax.jit(lambda a, d: retract_arrays(a, d, layout))
    _, t_ret = timed(ret, arrays, dx); print(f'retract: {t_ret*1e3:.1f} ms', flush=True)
    print(f'TOTAL/try: {(t_sys+t_fac+t_sol+t_ret+t_err)*1e3:.1f} ms', flush=True)

if __name__ == '__main__':
    main()
