"""Shonan rotation averaging: certifiably-correct SO(3) averaging via the
Riemannian staircase over SO(p).

Reference: gtsam/sfm/ShonanAveraging.{h,cpp} (buildGraphAt:138, run:404,
computeMinEigenValue:253 with accelerated power method), ShonanFactor.cpp
(error = vec(Q2[:, :3]) - vec(Q1[:, :3] @ R12)).

TPU-native: one ShonanFactor batch per level p (vmapped residuals over edges),
LM on batched SO(p) matrices, and the dual certificate's min-eigenvalue by a
shifted power iteration whose matvec is a batched gather/scatter over edges
(the Spectra/AcceleratedPowerMethod replacement, linear/AcceleratedPowerMethod.h).
"""

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import noise as noise_mod
from ..graph import factors as factors_mod
from ..graph import manifolds
from ..graph.graph import FactorGraph
from ..graph.values import Values
from ..optimize import optimizers as opt_mod


# -- SO(p) manifold (SOn.h analog, dynamic p) ------------------------------


def son_hat(xi, p: int):
    """Antisymmetric matrix from p(p-1)/2 vector; basis = (i<j) pairs."""
    A = jnp.zeros((p, p), dtype=xi.dtype)
    k = 0
    rows, cols = np.triu_indices(p, 1)
    A = A.at[rows, cols].set(-xi)
    A = A.at[cols, rows].set(xi)
    return A


def son_vee(A):
    p = A.shape[-1]
    rows, cols = np.triu_indices(p, 1)
    return A[..., cols, rows]


def _expm_ss(A, order=8, squarings=6):
    """Scaling-and-squaring truncated-series matrix exponential (differentiable;
    accurate for the small tangent steps LM takes)."""
    A = A / (2.0 ** squarings)
    out = jnp.eye(A.shape[-1], dtype=A.dtype)
    term = jnp.eye(A.shape[-1], dtype=A.dtype)
    for k in range(1, order + 1):
        term = term @ A / k
        out = out + term
    for _ in range(squarings):
        out = out @ out
    return out


def register_son(p: int) -> str:
    """Register (once) the SO(p) manifold type; returns its name."""
    name = f"SOn{p}"
    if name in manifolds.MANIFOLDS:
        return name
    dim = p * (p - 1) // 2

    def retract(Q, xi):
        return Q @ _expm_ss(son_hat(xi, p))

    def local(Q1, Q2):
        # log via series is unreliable far from I; use first-order skew part
        M = jnp.swapaxes(Q1, -1, -2) @ Q2
        S = 0.5 * (M - jnp.swapaxes(M, -1, -2))
        return son_vee(S)

    manifolds.register(manifolds.ManifoldType(
        name, dim, retract, local, lambda: jnp.eye(p)))
    return name


def lift(p: int, R):
    """SO(d) -> SO(p) embedding (SOn::Lift): top-left block."""
    n = R.shape[0]
    d = R.shape[-1]
    Q = np.tile(np.eye(p), (n, 1, 1))
    Q[:, :d, :d] = np.asarray(R)
    return jnp.asarray(Q)


# -- Shonan ---------------------------------------------------------------


@dataclasses.dataclass
class ShonanParams:
    p_min: int = 3
    p_max: int = 8
    optimality_threshold: float = -1e-4  # ShonanAveragingParameters default
    anchor_weight: float = 100.0
    lm: Optional[opt_mod.LMParams] = None
    certify: bool = True


def shonan_factors(p: int, i_keys, j_keys, R_meas, kappa=None) -> factors_mod.FactorBatch:
    """ShonanFactor<3> batch at level p: r = vec(Q2[:, :3] - Q1[:, :3] @ R12)."""
    tname = register_son(p)
    n = len(i_keys)
    R_meas = jnp.asarray(R_meas)
    kappa = jnp.ones(n) if kappa is None else jnp.asarray(kappa)

    def residual(xs, meas):
        Q1, Q2 = xs
        Rij, k = meas
        r = Q2[:, :3] - Q1[:, :3] @ Rij
        return jnp.sqrt(k) * r.reshape(-1)

    keys = np.stack([np.asarray(i_keys), np.asarray(j_keys)], axis=1)
    return factors_mod.FactorBatch(
        f"Shonan{p}", (tname, tname), keys, 3 * p, residual,
        (R_meas, kappa), noise_mod.unit())


def initialize_orientations_chordal(edges: List[Tuple[int, int, np.ndarray]],
                                    n: int) -> np.ndarray:
    """Chordal rotation initialization (InitializePose3::computeOrientationsChordal)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    rows, cols, vals = [], [], []
    rc = 0
    for (i, j, Rij) in edges:
        for r in range(3):
            rows.append(rc + r); cols.append(3 * j + r); vals.append(1.0)
            for c in range(3):
                rows.append(rc + r); cols.append(3 * i + c); vals.append(-Rij[c, r])
        rc += 3
    for r in range(3):
        rows.append(rc + r); cols.append(r); vals.append(10.0)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(rc + 3, 3 * n))
    lu = spla.splu((A.T @ A).tocsc())
    X = np.zeros((n, 3, 3))
    for r in range(3):
        b = np.zeros(rc + 3)
        b[rc + r] = 10.0
        X[:, r, :] = lu.solve(A.T @ b).reshape(n, 3)
    U, _s, Vt = np.linalg.svd(X)
    D = np.tile(np.eye(3), (n, 1, 1))
    D[:, 2, 2] = np.linalg.det(U @ Vt)
    return U @ D @ Vt


def _certificate_min_eig(edges, kappas, R_sol, iters=200) -> float:
    """lambda_min of S = L - Lambda at the rounded solution (SE-Sync dual).

    Y rows are R_i^T; L_ij = -kappa R_ij, L_ii += kappa I.  Power iteration on
    (sigma I - S).
    """
    n = R_sol.shape[0]
    ii = np.asarray([e[0] for e in edges])
    jj = np.asarray([e[1] for e in edges])
    Rij = jnp.asarray(np.stack([e[2] for e in edges]))
    kap = jnp.asarray(kappas)
    deg = np.zeros(n)
    np.add.at(deg, ii, np.asarray(kappas))
    np.add.at(deg, jj, np.asarray(kappas))
    Y = jnp.swapaxes(jnp.asarray(R_sol), 1, 2)  # (n, 3, 3), rows R_i^T

    def L_mat(V):
        """V: (n, 3, m) stacked; returns L V."""
        out = deg[:, None, None] * V
        contrib_i = -kap[:, None, None] * jnp.einsum("eab,ebm->eam", Rij, V[jj])
        contrib_j = -kap[:, None, None] * jnp.einsum("eba,ebm->eam", Rij, V[ii])
        out = out.at[ii].add(contrib_i)
        out = out.at[jj].add(contrib_j)
        return out

    LY = L_mat(Y)
    # Lambda_i = sym(LY_i Y_i^T)
    Lam = jnp.einsum("nam,nbm->nab", LY, Y)
    Lam = 0.5 * (Lam + jnp.swapaxes(Lam, 1, 2))

    def S_mat(V):
        return L_mat(V) - jnp.einsum("nab,nbm->nam", Lam, V)

    # sigma: cheap upper bound on lambda_max(S)
    sigma = 2.0 * float(deg.max()) + 1.0

    def body(v, _):
        w = sigma * v - S_mat(v)
        w = w / jnp.linalg.norm(w)
        return w, None

    key = jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (n, 3, 1))
    v0 = v0 / jnp.linalg.norm(v0)
    v, _ = jax.lax.scan(body, v0, None, length=iters)
    lam_shift = float(jnp.vdot(v, sigma * v - S_mat(v)))
    return sigma - lam_shift


def shonan_averaging(edges: List[Tuple[int, int, np.ndarray]], n: int,
                     params: Optional[ShonanParams] = None):
    """Run the staircase.  edges: (i, j, Rij 3x3).  Returns (R (n,3,3), lambda_min)."""
    params = params or ShonanParams()
    lm = params.lm or opt_mod.LMParams(max_iterations=100)
    kappas = np.ones(len(edges))
    R = initialize_orientations_chordal(edges, n)
    lam_min = -np.inf
    ii = [e[0] for e in edges]
    jj = [e[1] for e in edges]
    Rm = np.stack([e[2] for e in edges])
    for p in range(params.p_min, params.p_max + 1):
        tname = register_son(p)
        Q0 = lift(p, R)
        vals = Values({tname: Q0}, {tname: np.arange(n, dtype=np.int64)})
        graph = FactorGraph([shonan_factors(p, ii, jj, Rm, kappas)])
        # anchor: prior on Q_0 fixes the gauge (parameters_.anchor analog)
        anchor = factors_mod.prior_factors(
            tname, [0], jax.tree.map(lambda a: a[:1], Q0),
            noise_mod.isotropic(p * (p - 1) // 2,
                                1.0 / np.sqrt(params.anchor_weight)))
        graph.add(anchor)
        res = opt_mod.levenberg_marquardt(graph, vals, lm)
        Q = np.asarray(res.values.arrays[tname])
        # round: project stacked (n*3, 3)ish Stiefel blocks back to SO(3)
        R = _round_solution(Q)
        if not params.certify:
            return jnp.asarray(R), None
        lam_min = _certificate_min_eig(edges, kappas, R)
        if lam_min > params.optimality_threshold:
            return jnp.asarray(R), lam_min
    return jnp.asarray(R), lam_min


def _round_solution(Q: np.ndarray) -> np.ndarray:
    """SO(p) solution -> SO(3) (roundSolution, SE-Sync style).

    Stiefel blocks Y_i = Q_i[:, :3] (p x 3).  Find the shared dominant 3D
    subspace U (p x 3) by SVD of the horizontal stack, set A_i = U^T Y_i and
    project each A_i to SO(3)."""
    n, p, _ = Q.shape
    Y = Q[:, :, :3]                               # (n, p, 3)
    if p == 3:
        src = Y
    else:
        stack = np.concatenate(list(Y.transpose(0, 1, 2)), axis=1)  # (p, 3n)
        U, _s, _vt = np.linalg.svd(stack, full_matrices=False)
        U3 = U[:, :3]                              # (p, 3)
        src = np.einsum("pe,npd->ned", U3, Y)      # (n, 3, 3)
    R = np.zeros((n, 3, 3))
    for i in range(n):
        u, _s, vt = np.linalg.svd(src[i])
        Ri = u @ vt
        if np.linalg.det(Ri) < 0:
            Ri = u @ np.diag([1.0, 1.0, -1.0]) @ vt
        R[i] = Ri
    # gauge-fix: R_0 = I
    return np.einsum("ab,nbc->nac", R[0].T, R)
