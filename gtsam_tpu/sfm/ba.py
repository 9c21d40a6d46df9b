"""Bundle adjustment via Schur-complement landmark elimination.

The TPU-native replacement for the reference's smart-factor/Schur machinery
(gtsam/geometry/CameraSet.h:174 SchurComplement, slam/RegularImplicitSchurFactor.h,
slam/JacobianFactorQ.h): landmarks are eliminated analytically per-track with
batched 3x3 algebra (segment_sum over observations), and the reduced camera
system S = Hpp - Hpl Hll^-1 Hlp is assembled DENSE on device via scatter-add of
per-observation-pair 9x9 blocks — dense Cholesky of S then rides the MXU.
Everything is static-shaped and jit-compiled; the LM loop matches
LevenbergMarquardtOptimizer semantics.
"""

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import noise as noise_mod
from ..geometry.cameras import BalCamera, bal_retract
from ..geometry.se3 import SE3
from ..graph import factors as factors_mod
from ..optimize.optimizers import LMParams, check_convergence
from . import bal as bal_mod


@dataclasses.dataclass(frozen=True)
class SchurStructure:
    """Host-side static structure for one BA problem.

    Directed pair list (both (a,b) and (b,a) for a != b), PRE-SORTED by
    destination camera-block cell, so the reduced-camera assembly is a
    duplicate-free segment-sum + one unique-cell scatter (TPU scatters with
    duplicate indices serialize; segment reductions don't).
    """

    obs_cam: np.ndarray   # (K,) sorted by point
    obs_pt: np.ndarray    # (K,) sorted (segment ids)
    pair_a: np.ndarray    # (P,) directed pairs, sorted by dest cell
    pair_b: np.ndarray    # (P,)
    pair_seg: np.ndarray  # (P,) segment id = index into cell_unique
    cell_unique: np.ndarray  # (U,) flat cell index ca*M+cb
    num_cameras: int
    num_points: int

    @staticmethod
    def build(obs_cam, obs_pt, num_cameras, num_points) -> "SchurStructure":
        order = np.argsort(obs_pt, kind="stable")
        oc, op = obs_cam[order], obs_pt[order]
        # directed pairs within each track
        pa, pb = [], []
        start = 0
        K = len(op)
        while start < K:
            end = start
            while end < K and op[end] == op[start]:
                end += 1
            idxs = np.arange(start, end)
            A, B = np.meshgrid(idxs, idxs, indexing="ij")
            pa.append(A.reshape(-1))
            pb.append(B.reshape(-1))
            start = end
        pa = np.concatenate(pa).astype(np.int32) if pa else np.zeros(0, np.int32)
        pb = np.concatenate(pb).astype(np.int32) if pb else np.zeros(0, np.int32)
        cells = oc[pa].astype(np.int64) * num_cameras + oc[pb]
        cell_order = np.argsort(cells, kind="stable")
        pa, pb, cells = pa[cell_order], pb[cell_order], cells[cell_order]
        cell_unique, pair_seg = np.unique(cells, return_inverse=True)
        return SchurStructure(oc, op, pa, pb,
                              pair_seg.astype(np.int32),
                              cell_unique.astype(np.int64),
                              num_cameras, num_points), order


def _invert_3x3_psd(H, lam):
    """Batched damped inverse of (N,3,3) PSD blocks."""
    Hd = H + lam * jnp.eye(3, dtype=H.dtype)
    return jnp.linalg.inv(Hd)


def _dense_spd_solve(S, rhs, mixed_precision=False, refine_iters=2):
    """Jacobi-equilibrated Cholesky solve; optionally factorize in f32 on the
    MXU and recover accuracy with iterative refinement (TPU f64 is emulated and
    slow/expensive to compile at scale — SURVEY.md §7 'f32 + refinement').

    Equilibration D^-1/2 S D^-1/2 removes the scale-induced conditioning of BA
    systems (focal lengths vs distortion coefficients span ~1e10)."""
    d = jnp.clip(jnp.diagonal(S), 1e-12, None)
    s = jax.lax.rsqrt(d)
    Se = S * s[:, None] * s[None, :]
    rhe = rhs * s
    if not mixed_precision or S.dtype == jnp.float32:
        L = jnp.linalg.cholesky(Se)
        return jax.scipy.linalg.cho_solve((L, True), rhe) * s
    S32 = Se.astype(jnp.float32)
    L32 = jnp.linalg.cholesky(S32)

    def solve32(r):
        return jax.scipy.linalg.cho_solve((L32, True),
                                          r.astype(jnp.float32)).astype(S.dtype)

    x = solve32(rhe)
    for _ in range(refine_iters):
        r = rhe - Se @ x
        x = x + solve32(r)
    return x * s


def schur_solve(st: SchurStructure, A_cam, A_pt, b, lam, diagonal_damping=False,
                mixed_precision=False):
    """Solve the damped GN system by landmark elimination.

    A_cam: (K, 2, 9), A_pt: (K, 2, 3), b: (K, 2) — whitened, sorted by point.
    Returns (delta_cam (M,9), delta_pt (N,3)).
    """
    M, N = st.num_cameras, st.num_points
    dt = A_cam.dtype
    seg_pt = jnp.asarray(st.obs_pt)
    seg_cam = jnp.asarray(st.obs_cam)

    # per-landmark Hessian blocks and gradients
    Hll = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", A_pt, A_pt), seg_pt, N)
    gl = jax.ops.segment_sum(jnp.einsum("kri,kr->ki", A_pt, b), seg_pt, N)
    # per-camera diagonal blocks and gradients
    Hpp = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", A_cam, A_cam), seg_cam, M)
    gp = jax.ops.segment_sum(jnp.einsum("kri,kr->ki", A_cam, b), seg_cam, M)
    # per-observation coupling W_k = A_cam^T A_pt  (9,3)
    W = jnp.einsum("kri,krj->kij", A_cam, A_pt)

    if diagonal_damping:
        lam_ll = lam * jnp.einsum("nii->ni", Hll).mean(-1)[:, None, None]
        C = jnp.linalg.inv(Hll + lam_ll * jnp.eye(3, dtype=dt))
    else:
        C = _invert_3x3_psd(Hll, lam)

    # reduced gradient: gp_tilde = gp - sum_k W_k C_{pt_k} gl_{pt_k}
    Cg = jnp.einsum("nij,nj->ni", C, gl)           # (N, 3)
    corr = jnp.einsum("kij,kj->ki", W, Cg[seg_pt])  # (K, 9)
    gp_t = gp - jax.ops.segment_sum(corr, seg_cam, M)

    # reduced camera matrix: S[ca, cb] -= W_a C W_b^T for obs pairs in a track.
    # Assembled on an (M, M, 9, 9) block layout so the scatter carries (P,)
    # indices with (9, 9) windows — no (P, 9, 9) index arrays (HBM-friendly);
    # pair products are chunked to bound intermediates.
    # flat (M*M, 81) layout: directed pair products segment-summed per unique
    # destination cell (pre-sorted host-side), then ONE duplicate-free scatter.
    WC = jnp.einsum("kij,kjl->kil", W, C[seg_pt])   # (K, 9, 3)
    Sflat = jnp.zeros((M * M, 81), dtype=dt)
    P_total = len(st.pair_a)
    U = len(st.cell_unique)
    if P_total:
        cellsum = jnp.zeros((U, 81), dtype=dt)
        # chunk bound: the (chunk, 9, 9) product tensor tiles to (8,128) per
        # 9x9 block (~25x HBM padding); 128k rows keeps it ~1GB
        CHUNK = 1 << 17
        for s0 in range(0, P_total, CHUNK):
            pa = jnp.asarray(st.pair_a[s0:s0 + CHUNK])
            pb = jnp.asarray(st.pair_b[s0:s0 + CHUNK])
            seg = jnp.asarray(st.pair_seg[s0:s0 + CHUNK])
            blocks = jnp.einsum("pij,plj->pil", WC[pa], W[pb])  # (p, 9, 9)
            cellsum = cellsum + jax.ops.segment_sum(
                blocks.reshape(-1, 81), seg, U)
        Sflat = Sflat.at[jnp.asarray(st.cell_unique)].set(-cellsum)
    # add Hpp diagonal blocks + damping
    diag_idx = jnp.arange(M, dtype=jnp.int32)
    if diagonal_damping:
        damp = lam * jnp.einsum("mii->mi", Hpp)
        Hpp_d = Hpp + jax.vmap(jnp.diag)(damp)
    else:
        Hpp_d = Hpp + lam * jnp.eye(9, dtype=dt)
    Sflat = Sflat.at[diag_idx * M + diag_idx].add(Hpp_d.reshape(-1, 81))
    S = jnp.transpose(Sflat.reshape(M, M, 9, 9), (0, 2, 1, 3)).reshape(
        9 * M, 9 * M)

    # dense factorize + solve
    dc = _dense_spd_solve(S, gp_t.reshape(-1), mixed_precision).reshape(M, 9)

    # back-substitute landmarks
    Wt_dc = jnp.einsum("kij,ki->kj", W, dc[seg_cam])   # (K, 3)
    rhs_l = gl - jax.ops.segment_sum(Wt_dc, seg_pt, N)
    dl = jnp.einsum("nij,nj->ni", C, rhs_l)
    return dc, dl


def ba_optimize(prob: bal_mod.BalProblem, params: Optional[LMParams] = None,
                verbose: bool = False, dtype=None, mixed_precision: bool = False):
    """Full BAL bundle adjustment: LM with Schur elimination.

    Returns (values_dict, info).  Reference flow: timing/timeSFMBAL.h (LM with
    MULTIFRONTAL + Schur via dense elimination ordering putting points first).
    """
    params = params or LMParams()
    dt = dtype or jnp.result_type(float)
    st, order = SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                     prob.num_cameras, prob.num_points)
    uv = jnp.asarray(prob.obs_uv[order], dtype=dt)

    batch = factors_mod.custom_factors(
        "ProjectionBal", ("BalCamera", "Point3"),
        np.zeros((len(st.obs_cam), 2), dtype=np.int64),  # keys unused here
        bal_mod._projection_residual, 2, uv, noise_mod.unit())

    obs_cam = jnp.asarray(st.obs_cam)
    obs_pt = jnp.asarray(st.obs_pt)

    def gather(cams, pts):
        cam_k = jax.tree.map(lambda a: a[obs_cam], cams)
        pt_k = pts[obs_pt]
        return cam_k, pt_k

    @jax.jit
    def error_fn(cams, pts):
        cam_k, pt_k = gather(cams, pts)
        r = factors_mod.residuals(batch, (cam_k, pt_k))
        return 0.5 * jnp.sum(r * r)

    @jax.jit
    def linearize_fn(cams, pts):
        cam_k, pt_k = gather(cams, pts)
        (A_cam, A_pt), b = factors_mod.linearize(batch, (cam_k, pt_k))
        return A_cam, A_pt, b

    @partial(jax.jit, static_argnums=(6,))
    def try_step(cams, pts, A_cam, A_pt, b, lam, diagonal_damping):
        dc, dl = schur_solve(st, A_cam, A_pt, b, lam, diagonal_damping,
                             mixed_precision=mixed_precision)
        new_cams = jax.vmap(bal_retract)(cams, dc)
        new_pts = pts + dl
        return new_cams, new_pts, error_fn(new_cams, new_pts)

    cams = BalCamera(SE3(jnp.asarray(prob.cam_R, dtype=dt),
                         jnp.asarray(prob.cam_t, dtype=dt)),
                     jnp.asarray(prob.cam_calib, dtype=dt))
    pts = jnp.asarray(prob.points, dtype=dt)

    import time as _time
    error = float(error_fn(cams, pts))
    history = [error]
    iter_times = []
    lam = params.lambda_initial
    it = 0
    converged = False
    for it in range(1, params.max_iterations + 1):
        _t0 = _time.time()
        A_cam, A_pt, b = linearize_fn(cams, pts)
        prev = error
        accepted = False
        while True:
            nc, npts, ne = try_step(cams, pts, A_cam, A_pt, b, lam,
                                    params.diagonal_damping)
            ne = float(ne)
            if math.isfinite(ne) and ne < error:
                cams, pts, error = nc, npts, ne
                lam = max(lam / params.lambda_factor, params.lambda_lower_bound)
                accepted = True
                break
            lam *= params.lambda_factor
            if lam > params.lambda_upper_bound:
                break
        iter_times.append(_time.time() - _t0)
        if verbose:
            print(f"BA iter {it}: {prev:.6g} -> {error:.6g} lambda={lam:.3g} "
                  f"({iter_times[-1]:.2f}s)", flush=True)
        history.append(error)
        if not accepted:
            break
        if check_convergence(prev, error, params):
            converged = True
            break
    return dict(cams=cams, points=pts), dict(
        error=error, iterations=it, converged=converged, history=history,
        iter_times=iter_times)
