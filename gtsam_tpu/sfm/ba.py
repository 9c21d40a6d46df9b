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
from ..config import default_dtype as _default_dtype
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

    TPU design: observations are sorted by (track length, point), and the
    directed pair-product list by (cell run length, cell), so every segmented
    reduction becomes a CONTIGUOUS reshape-reduce per run-length group — pure
    dense ops, no scatter (TPU scatter/gather process rows serially; a
    sorted-run reduce is HBM-speed).  Long runs (> _GROUP_CAP) fall back to one
    segment_sum over the contiguous tail.  Points are internally renumbered by
    group order; `point_perm` maps internal -> original ids.
    """

    obs_cam: np.ndarray    # (K,) camera id per obs (grouped order)
    obs_pt: np.ndarray     # (K,) ORIGINAL point id per obs (grouped order)
    obs_pt_new: np.ndarray  # (K,) internal (grouped) point id per obs
    point_perm: np.ndarray  # (N,) internal id -> original id
    pt_groups: tuple        # ((row0, n, l), ...) dense groups over obs rows
    pt_tail: tuple          # (row0, seg_ids, nseg) or None
    pair_a: np.ndarray     # (P,) obs-row index (grouped order)
    pair_b: np.ndarray     # (P,)
    cell_unique: np.ndarray  # (U,) flat cell ca*M+cb, in cell-group order
    cell_groups: tuple     # ((pair0, n, l), ...) dense groups over pair rows
    cell_tail: tuple       # (pair0, seg_ids, nseg) or None
    num_cameras: int
    num_points: int
    cam_pad_idx: np.ndarray  # (R,) obs row per padded slot (sentinel K = zero)
    cam_buckets: tuple     # ((pos0, n_runs, P), ...) pow2-padded dense buckets
    cam_tail: None         # unused (kept for layout symmetry)
    cam_ids: np.ndarray    # (Mu,) camera id per reduced run (bucket order)
    # symmetric (undirected) cell plan — round-2 fast path: per-track-group
    # upper pairs computed by einsum in TRACK order (no per-pair gathers),
    # then ONE fused gather to pow2-padded cell-sorted buckets.
    sym_groups: tuple = ()     # ((row0, n, l, iu, ju, swap(n,Pl)), ...)
    sym_pad_idx: np.ndarray = None  # (Rp,) padded gather into upper-pair rows
    sym_buckets: tuple = ()    # ((pos0, n_runs, Pw), ...) over sym_pad_idx
    sym_cells: np.ndarray = None    # (Uu,) flat min*M+max cell per reduced run
    sym_tail_rows: np.ndarray = None  # rows into upper-pairs for tail pairs

    @staticmethod
    def build(obs_cam, obs_pt, num_cameras, num_points) -> "SchurStructure":
        order0 = np.argsort(obs_pt, kind="stable")
        op0 = obs_pt[order0]
        segs, first, counts = np.unique(op0, return_index=True,
                                        return_counts=True)
        row_order, gorder, groups, tail = _length_group_plan(first, counts)
        order = order0[row_order]
        oc = obs_cam[order].astype(np.int32)
        op = obs_pt[order].astype(np.int32)
        lens = counts[gorder]
        Ns = len(segs)
        obs_pt_new = np.repeat(np.arange(Ns, dtype=np.int32), lens)
        point_perm = np.concatenate([
            segs[gorder],
            np.setdiff1d(np.arange(num_points), segs, assume_unique=False),
        ]).astype(np.int32)

        # directed pair products, vectorized per length group
        pa_list, pb_list = [], []
        for (r0, n, l) in groups:
            idx = (r0 + np.arange(n * l, dtype=np.int32)).reshape(n, l)
            A = np.broadcast_to(idx[:, :, None], (n, l, l))
            B = np.broadcast_to(idx[:, None, :], (n, l, l))
            pa_list.append(A.reshape(-1))
            pb_list.append(B.reshape(-1))
        if tail is not None:
            t0, seg_ids, nseg = tail
            for sg in range(nseg):
                idx = t0 + np.where(seg_ids == sg)[0].astype(np.int32)
                A, B = np.meshgrid(idx, idx, indexing="ij")
                pa_list.append(A.reshape(-1))
                pb_list.append(B.reshape(-1))
        pa = (np.concatenate(pa_list).astype(np.int32)
              if pa_list else np.zeros(0, np.int32))
        pb = (np.concatenate(pb_list).astype(np.int32)
              if pb_list else np.zeros(0, np.int32))

        cells = oc[pa].astype(np.int64) * num_cameras + oc[pb]
        cell_order0 = np.argsort(cells, kind="stable")
        cells_s = cells[cell_order0]
        cu, cfirst, ccounts = np.unique(cells_s, return_index=True,
                                        return_counts=True)
        crow_order, cgorder, cgroups, ctail = _length_group_plan(
            cfirst, ccounts)
        pair_order = cell_order0[crow_order]

        # camera-side reduction plan: obs rows sorted by camera id so the
        # per-camera Hpp/gradient reductions are contiguous reshape-reduces
        # (jax.ops.segment_sum lowers to a duplicate-index scatter, which TPU
        # serializes per row — ~0.25 s/iter at Ladybug scale)
        kam_order0 = np.argsort(oc, kind="stable").astype(np.int32)
        ocs = oc[kam_order0]
        kam_ids, kfirst, kcounts = np.unique(ocs, return_index=True,
                                             return_counts=True)
        cam_pad_idx, cam_buckets, kgorder = _pow2_pad_plan(
            kam_order0, kfirst, kcounts, sentinel=len(oc))
        cam_ids = kam_ids[kgorder].astype(np.int32)

        # --- symmetric (undirected) cell plan: only when every track fits a
        # dense length group (pt_tail None).  Upper pairs are computed by
        # per-group einsum in TRACK order (zero per-pair gathers), value
        # ordered by camera id (swap mask; S[min,max] block), then one fused
        # pow2-padded gather reduces them into cell-sorted buckets; the
        # assemble step mirrors off-diagonal cells by lane transpose.
        sym_groups = ()
        sym_pad_idx = sym_buckets = sym_cells = None
        if tail is None and groups:  # guard: zero-observation problems
            # fall through to the general path when there is nothing to plan
            ia_parts, ib_parts, swap_parts, diag_parts, cell_parts = \
                [], [], [], [], []
            for (r0, ng, l) in groups:
                iu, ju = np.triu_indices(l)
                base = (r0 + np.arange(ng, dtype=np.int64)[:, None] * l)
                ia_parts.append((base + iu[None, :]).reshape(-1))
                ib_parts.append((base + ju[None, :]).reshape(-1))
                oc_g = oc[r0:r0 + ng * l].reshape(ng, l)
                cam_u = oc_g[:, iu].astype(np.int64)
                cam_v = oc_g[:, ju].astype(np.int64)
                swap_parts.append((cam_u > cam_v).reshape(-1))
                diag_parts.append(
                    ((cam_u == cam_v) & (iu != ju)[None, :]).reshape(-1))
                cell_parts.append((np.minimum(cam_u, cam_v) * num_cameras
                                   + np.maximum(cam_u, cam_v)).reshape(-1))
            cells_half = (np.concatenate(cell_parts) if cell_parts
                          else np.zeros(0, np.int64))
            Ptot = len(cells_half)
            # compose the cell sort INTO the operand gather indices, so the
            # product rows are BORN in cell-sorted order (one gather each,
            # no reorder pass)
            cperm = np.argsort(cells_half, kind="stable")
            ia = np.concatenate(ia_parts)[cperm].astype(np.int32)
            ib = np.concatenate(ib_parts)[cperm].astype(np.int32)
            swap = np.concatenate(swap_parts)[cperm]
            diagp = np.concatenate(diag_parts)[cperm]
            cs = cells_half[cperm]
            cuniq, cfirst2, ccnt2 = np.unique(cs, return_index=True,
                                              return_counts=True)
            sym_pad_idx, sym_buckets_l, crun_order = _pow2_pad_plan(
                np.arange(Ptot, dtype=np.int32), cfirst2, ccnt2,
                sentinel=Ptot)
            sym_cells = cuniq[crun_order].astype(np.int64)
            sym_groups = (ia, ib, swap, diagp)
            sym_buckets = tuple(sym_buckets_l)

        return SchurStructure(
            oc, op, obs_pt_new, point_perm, tuple(groups), tail,
            pa[pair_order], pb[pair_order],
            cu[cgorder].astype(np.int64), tuple(cgroups), ctail,
            num_cameras, num_points,
            cam_pad_idx, tuple(cam_buckets), None, cam_ids,
            sym_groups, sym_pad_idx, sym_buckets, sym_cells, None), order


_GROUP_CAP = 64

# flat-lane outer-product index maps (trailing dim 81/27/9 instead of (9,9)
# etc. — TPU tiles pad the last dim to 128 lanes, so wide-flat layouts waste
# 1.6x instead of 14x HBM)
_I9, _J9 = np.divmod(np.arange(81), 9)
_I3, _J3 = np.divmod(np.arange(9), 3)
_I93, _J93 = np.divmod(np.arange(27), 3)


def _length_group_plan(first, counts):
    """Group sorted runs by length.  Returns (row_order, gorder, groups, tail):
    row_order permutes rows so same-length runs are contiguous; groups =
    ((row0, n_runs, length), ...) for lengths <= _GROUP_CAP; tail handles the
    rest via (row0, compact seg ids, nseg)."""
    gorder = np.argsort(counts, kind="stable")
    lens = counts[gorder]
    starts = first[gorder]
    cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
    row_order = np.repeat(starts - cum, lens) + np.arange(int(lens.sum()))
    groups, tail = [], None
    pos = 0
    row_pos = 0
    nseg = len(lens)
    while pos < nseg:
        l = int(lens[pos])
        n = int(np.searchsorted(lens, l, side="right") - pos)
        if l <= _GROUP_CAP:
            groups.append((int(row_pos), n, l))
        else:
            seg_ids = np.repeat(np.arange(nseg - pos, dtype=np.int32),
                                lens[pos:])
            tail = (int(row_pos), seg_ids, nseg - pos)
            break
        pos += n
        row_pos += n * l
    return row_order, gorder, groups, tail


def _pow2_pad_plan(row_order, first, counts, sentinel):
    """Pad each sorted run to the next power of two and bucket runs by padded
    length.  Returns (pad_idx, buckets, run_order): pad_idx (R,) indexes the
    original rows (== sentinel for padding slots, which must map to a zero
    row); buckets = ((pos0, n_runs, P), ...) contiguous in pad_idx; run_order
    permutes the input runs into bucket order.  This turns an arbitrary
    segmented reduction into <= log2(maxlen) dense reshape-reduces at <= 2x
    row inflation — no scatter, no serialization (TPU scatters with duplicate
    indices process rows serially)."""
    pows = np.maximum(1, 1 << np.ceil(np.log2(np.maximum(counts, 1))
                                      ).astype(np.int64))
    run_order = np.argsort(pows, kind="stable")
    pad_idx_parts, buckets = [], []
    pos = 0
    i = 0
    nruns = len(counts)
    while i < nruns:
        P = int(pows[run_order[i]])
        j = int(np.searchsorted(pows[run_order], P, side="right"))
        runs = run_order[i:j]
        block = np.full((len(runs), P), sentinel, dtype=np.int32)
        for r, run in enumerate(runs):
            c = int(counts[run])
            f = int(first[run])
            block[r, :c] = row_order[f:f + c]
        pad_idx_parts.append(block.reshape(-1))
        buckets.append((pos, len(runs), P))
        pos += len(runs) * P
        i = j
    pad_idx = (np.concatenate(pad_idx_parts).astype(np.int32)
               if pad_idx_parts else np.zeros(0, np.int32))
    return pad_idx, buckets, run_order


def _padded_reduce(rows, pad_idx, buckets, num_out, out_ids):
    """Sum padded contiguous runs: rows (K, W) -> (num_out, W) scattered to
    out_ids (unique).  pad_idx slots == K gather an appended zero row."""
    W = rows.shape[1]
    ext = jnp.concatenate([rows, jnp.zeros((1, W), dtype=rows.dtype)])
    g = ext[jnp.asarray(pad_idx)]
    outs = [g[p0:p0 + n * P].reshape(n, P, W).sum(1) for (p0, n, P) in buckets]
    if not outs:
        return jnp.zeros((num_out, W), dtype=rows.dtype)
    red = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    return jnp.zeros((num_out, W), dtype=rows.dtype).at[
        jnp.asarray(out_ids)].set(red)


def _grouped_reduce(rows, groups, tail):
    """Sum sorted contiguous runs: rows (K, W) -> (num_runs, W)."""
    W = rows.shape[1]
    outs = []
    for (r0, n, l) in groups:
        outs.append(rows[r0:r0 + n * l].reshape(n, l, W).sum(1))
    if tail is not None:
        t0, seg_ids, nseg = tail
        outs.append(jax.ops.segment_sum(rows[t0:], jnp.asarray(seg_ids), nseg))
    if not outs:
        return jnp.zeros((0, W), dtype=rows.dtype)
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def _flat_mm(X, Y, p, q, r):
    """Row-batched (p, q) @ (q, r) on FLAT-LANE storage: X (N, p*q) row-major,
    Y (N, q*r) row-major -> (N, p*r).  q static lane-gather multiplies — never
    materializes (N, p, q) trailing dims (TPU tiles pad them ~25x) and never
    stacks (N, 1) columns (each pads to 128 lanes)."""
    pr_lanes = np.arange(p * r)
    out = None
    for j in range(q):
        A = jnp.asarray((pr_lanes // r) * q + j)
        B = jnp.asarray(j * r + pr_lanes % r)
        t = X[:, A] * Y[:, B]
        out = t if out is None else out + t
    return out


def _inv3x3(Hd):
    """Batched closed-form (adjugate) 3x3 inverse.

    TPU-native: pure elementwise mul/add — works in emulated f64 (XLA's
    LuDecomposition expander, which jnp.linalg.inv lowers to, is f32-only on
    TPU) and beats an LU kernel for 3x3 anyway."""
    a, b, c = Hd[..., 0, 0], Hd[..., 0, 1], Hd[..., 0, 2]
    d, e, f = Hd[..., 1, 0], Hd[..., 1, 1], Hd[..., 1, 2]
    g, h, i = Hd[..., 2, 0], Hd[..., 2, 1], Hd[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    Hc = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([A, B, C], axis=-1),
        jnp.stack([D, E, F], axis=-1),
        jnp.stack([G, Hc, I], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def _invert_3x3_psd(H, lam):
    """Batched damped inverse of (N,3,3) PSD blocks."""
    Hd = H + lam * jnp.eye(3, dtype=H.dtype)
    return _inv3x3(Hd)


def _dense_spd_solve(S, rhs, mixed_precision=False, refine_iters=2):
    """Jacobi-equilibrated Cholesky solve; optionally factorize in f32 on the
    MXU and recover accuracy with iterative refinement (TPU f64 is emulated and
    slow/expensive to compile at scale — SURVEY.md §7 'f32 + refinement').

    Equilibration D^-1/2 S D^-1/2 removes the scale-induced conditioning of BA
    systems (focal lengths vs distortion coefficients span ~1e10).

    mixed_precision refinement: the factorization always runs in f32 (MXU);
    the refinement residual r = rhs - S x is accumulated in f64 when x64 is
    live — this is what rescues convergence at Ladybug scale, where
    cond(S_equilibrated) makes a plain f32 solve floor LM ~1e-4 above the
    reference optimum (measured: stall at half-chi2 330,009 vs 329,909)."""
    d = jnp.clip(jnp.diagonal(S), 1e-12, None)
    s = jax.lax.rsqrt(d)
    Se = S * s[:, None] * s[None, :]
    rhe = rhs * s
    x64 = jax.config.jax_enable_x64
    if not mixed_precision or (S.dtype == jnp.float32 and not x64):
        L = jnp.linalg.cholesky(Se)
        return jax.scipy.linalg.cho_solve((L, True), rhe) * s
    hi = jnp.float64 if x64 else S.dtype
    # HBM discipline (the whole BA fine step must stay < 15.75G): only S (the
    # input) is kept in f64; the equilibrated matrix exists ONLY as the f32
    # factorization operand (the scale+convert fuses, no f64 temp), and the
    # refinement matvec reads row chunks of S directly via dynamic_slice so
    # the transient is CH*n*8B, not n^2*8B
    S32 = (S * s[:, None] * s[None, :]).astype(jnp.float32)
    L32 = jnp.linalg.cholesky(S32)
    s_hi = s.astype(hi)

    def precond(r):
        """~S^-1 r via the equilibrated f32 factorization."""
        r32 = (r * s_hi).astype(jnp.float32)
        return s_hi * jax.scipy.linalg.cho_solve((L32, True), r32).astype(hi)

    n = S.shape[0]
    CH = 2048
    nch = -(-n // CH)

    if n <= CH:
        def hi_matvec(xv):
            return S.astype(hi) @ xv
    else:
        def hi_matvec(xv):
            starts = jnp.arange(nch, dtype=jnp.int32) * CH

            def f(i0):
                rows = jax.lax.dynamic_slice_in_dim(S, i0, CH, axis=0)
                return rows.astype(hi) @ xv

            out = jax.lax.map(f, starts)                # (nch, CH)
            res = jnp.zeros(nch * CH, dtype=hi)
            for k in range(nch):
                # dynamic_slice clamps the last start to n-CH; writing the
                # chunk at the same clamped offset re-writes equal values
                off = min(k * CH, n - CH)
                res = jax.lax.dynamic_update_slice(res, out[k], (off,))
            return res[:n]

    rhs_hi = rhs.astype(hi)
    x = precond(rhs_hi)
    for _ in range(refine_iters):
        r = rhs_hi - hi_matvec(x)
        x = x + precond(r)
    return x.astype(S.dtype)


def schur_solve(st: SchurStructure, A_cam, A_pt, b, lam, diagonal_damping=False,
                mixed_precision=False):
    """Solve the damped GN system by landmark elimination.

    A_cam: (K, 2, 9), A_pt: (K, 2, 3), b: (K, 2) — whitened, in st's grouped
    observation order.  Returns (delta_cam (M,9), delta_pt (N,3) in ORIGINAL
    point numbering).  All block algebra runs in flat-lane layout (81/27/9
    wide) and all point/cell reductions are contiguous reshape-reduces.
    """
    M, N = st.num_cameras, st.num_points
    dt = A_cam.dtype
    seg_cam = jnp.asarray(st.obs_cam)
    obs_pt_new = jnp.asarray(st.obs_pt_new)
    Ns = int(st.obs_pt_new[-1]) + 1 if len(st.obs_pt_new) else 0

    def cam_reduce(rows):
        return _padded_reduce(rows, st.cam_pad_idx, st.cam_buckets, M,
                              st.cam_ids)

    # per-landmark blocks (flat 9-wide), contiguous grouped reduction
    hll_k = (A_pt[:, :, _I3] * A_pt[:, :, _J3]).sum(1)          # (K, 9)
    gl_k = jnp.einsum("kri,kr->ki", A_pt, b)                     # (K, 3)
    Hll = _grouped_reduce(hll_k, st.pt_groups, st.pt_tail)       # (Ns, 9)
    gl = _grouped_reduce(gl_k, st.pt_groups, st.pt_tail)         # (Ns, 3)

    # per-camera diagonal blocks + gradients (flat 81+9-wide, one fused
    # pow2-padded reduction — no duplicate-index scatter)
    hpp_k = (A_cam[:, :, _I9] * A_cam[:, :, _J9]).sum(1)         # (K, 81)
    gp_k = jnp.einsum("kri,kr->ki", A_cam, b)                    # (K, 9)
    cam_red = cam_reduce(jnp.concatenate([hpp_k, gp_k], axis=1))
    Hpp, gp = cam_red[:, :81], cam_red[:, 81:]

    # per-observation coupling W_k = A_cam^T A_pt, flat 27-wide (i*3+j)
    W = (A_cam[:, :, _I93] * A_pt[:, :, _J93]).sum(1)            # (K, 27)

    if diagonal_damping:
        hdiag = (Hll[:, 0] + Hll[:, 4] + Hll[:, 8]) / 3.0
        C = _inv3x3(
            Hll.reshape(-1, 3, 3)
            + hdiag[:, None, None] * lam * jnp.eye(3, dtype=dt)).reshape(-1, 9)
    else:
        C = _invert_3x3_psd(Hll.reshape(-1, 3, 3), lam).reshape(-1, 9)

    # reduced gradient: gp_tilde = gp - sum_k W_k C_{pt_k} gl_{pt_k}
    Cg = _flat_mm(C, gl, 3, 3, 1)                                # (Ns, 3)
    Cgk = Cg[obs_pt_new]
    corr = _flat_mm(W, Cgk, 9, 3, 1)                             # (K, 9)
    gp_t = gp - cam_reduce(corr)

    # WC_k = W_k C_{pt_k}, flat 27-wide (i*3+l)
    Ck = C[obs_pt_new]
    WC = _flat_mm(W, Ck, 9, 3, 3)                                # (K, 27)

    # reduced camera matrix: S[ca, cb] -= WC_a W_b^T over track pairs
    Sflat = jnp.zeros((M * M, 81), dtype=dt)
    # sym fast path only in f32: its fused pair-product buffers are ~5x the
    # chunked general path's peak, which in f64 overflows HBM at Ladybug
    # scale (measured 20.5 GB needed); the general path below slices pairs
    # in 128k chunks so the f64 fine phase stays memory-bounded
    if st.sym_groups and dt == jnp.float32:
        # fast path: undirected upper pairs; the cell sort is composed into
        # the operand gather indices so product rows are BORN cell-sorted
        # (flat 81-lane products only — (…,9,9) trailing dims tile to 25x
        # HBM padding), then a pow2-padded contiguous bucket reduce; the
        # assemble mirrors off-diagonal cells by lane transpose.
        _T81 = (np.arange(81).reshape(9, 9).T).reshape(-1)
        iW = np.repeat(np.arange(9), 9)
        lW = np.tile(np.arange(9), 9)
        ia, ib, swap, diagp = st.sym_groups
        wcp = WC[jnp.asarray(ia)]                             # (Ph, 27)
        wvp = W[jnp.asarray(ib)]
        pr = wcp[:, 3 * iW + 0] * wvp[:, 3 * lW + 0]
        pr = pr + wcp[:, 3 * iW + 1] * wvp[:, 3 * lW + 1]
        pr = pr + wcp[:, 3 * iW + 2] * wvp[:, 3 * lW + 2]     # (Ph, 81)
        prT = pr[:, jnp.asarray(_T81)]
        sw = jnp.asarray(swap)[:, None]
        out = jnp.where(sw, prT, pr)
        if diagp.any():
            # same-camera off-diagonal pair inside one track: the directed
            # sum contributes X + X^T to the diagonal cell
            out = jnp.where(jnp.asarray(diagp)[:, None], pr + prT, out)
        ext = jnp.concatenate([out, jnp.zeros((1, 81), dtype=dt)])
        gat = ext[jnp.asarray(st.sym_pad_idx)]
        red = jnp.concatenate(
            [gat[p0:p0 + nr * Pw].reshape(nr, Pw, 81).sum(1)
             for (p0, nr, Pw) in st.sym_buckets]) \
            if len(st.sym_buckets) > 1 else \
            gat.reshape(st.sym_buckets[0][1], st.sym_buckets[0][2], 81).sum(1)
        Sflat = Sflat.at[jnp.asarray(st.sym_cells)].set(-red)
        ca_h, cb_h = np.divmod(st.sym_cells, M)
        off = np.flatnonzero(ca_h != cb_h)
        if len(off):
            mirror = cb_h[off] * M + ca_h[off]
            Sflat = Sflat.at[jnp.asarray(mirror)].set(
                -red[jnp.asarray(off)][:, jnp.asarray(_T81)])
    else:
        # general path (long-track tail present): directed pairs, grouped by
        # destination cell run so the reduction is contiguous
        iW = np.repeat(np.arange(9), 9)
        lW = np.tile(np.arange(9), 9)
        pa_all = jnp.asarray(st.pair_a)
        pb_all = jnp.asarray(st.pair_b)

        def _pair_rows(sl):
            wc = WC[pa_all[sl]]
            w = W[pb_all[sl]]
            acc = wc[:, 3 * iW + 0] * w[:, 3 * lW + 0]
            acc = acc + wc[:, 3 * iW + 1] * w[:, 3 * lW + 1]
            acc = acc + wc[:, 3 * iW + 2] * w[:, 3 * lW + 2]
            return acc                                           # (p, 81)

        CHUNK = 1 << 17
        cell_parts = []
        for (p0, n, l) in st.cell_groups:
            ncell_chunk = max(1, CHUNK // l)
            subs = []
            for c0 in range(0, n, ncell_chunk):
                nc = min(ncell_chunk, n - c0)
                sl = slice(p0 + c0 * l, p0 + (c0 + nc) * l)
                subs.append(_pair_rows(sl).reshape(nc, l, 81).sum(1))
            cell_parts.append(jnp.concatenate(subs)
                              if len(subs) > 1 else subs[0])
        if st.cell_tail is not None:
            t0, seg_ids, nseg = st.cell_tail
            acc = jnp.zeros((nseg, 81), dtype=dt)
            P_tail = len(st.pair_a) - t0
            for c0 in range(0, P_tail, CHUNK):
                sl = slice(t0 + c0, t0 + min(c0 + CHUNK, P_tail))
                acc = acc + jax.ops.segment_sum(
                    _pair_rows(sl), jnp.asarray(seg_ids[c0:c0 + CHUNK]), nseg)
            cell_parts.append(acc)
        U = len(st.cell_unique)
        if cell_parts:
            cellsum = (jnp.concatenate(cell_parts)
                       if len(cell_parts) > 1 else cell_parts[0])
        else:
            cellsum = jnp.zeros((0, 81), dtype=dt)
        # assemble on the flat (M*M, 81) layout (81-lane rows tile cleanly;
        # a (M,9,M,9) windowed scatter would materialize a (9,9,M^2) temp)
        if U:
            Sflat = Sflat.at[jnp.asarray(st.cell_unique)].set(-cellsum)
    diag_idx = jnp.arange(M, dtype=jnp.int32)
    if diagonal_damping:
        damp = lam * Hpp[:, _I9 == _J9]
        Hpp_d = Hpp.reshape(M, 9, 9) + jax.vmap(jnp.diag)(damp)
    else:
        Hpp_d = Hpp.reshape(M, 9, 9) + lam * jnp.eye(9, dtype=dt)
    Sflat = Sflat.at[diag_idx * M + diag_idx].add(Hpp_d.reshape(M, 81))
    # Assemble/solve in the PARAMETER-MAJOR permutation (row index i*M+a
    # instead of a*9+i): the (0,2,1,3) camera-major transpose materializes an
    # (M,9,M,9) copy whose 9-wide trailing dim pads 14.3x under TPU (8,128)
    # tiling — 12.8 GB at Ladybug scale, an HBM OOM.  (2,0,3,1) keeps M last
    # (~1.8x padding), and a symmetric permutation leaves the Cholesky
    # identical; only the rhs/solution transpose (M,9)<->(9,M), which is
    # negligible.
    S = jnp.transpose(Sflat.reshape(M, M, 9, 9), (2, 0, 3, 1)).reshape(
        9 * M, 9 * M)

    # dense factorize + solve (parameter-major rhs/solution)
    rhs_p = gp_t.reshape(M, 9).T.reshape(-1)
    dc = _dense_spd_solve(S, rhs_p, mixed_precision).reshape(9, M).T

    # back-substitute landmarks: dl = C (gl - W^T dc)
    dck = dc[seg_cam]                                            # (K, 9)
    # W^T dc: out lane j = sum_i W[:, 3i+j] * dck[:, i] — expand dck across
    # the 27 lanes, then 3-lane strided sums (all flat-lane, no stacks)
    tmp = W * dck[:, jnp.asarray(np.arange(27) // 3)]            # (K, 27)
    Wt_dc = None
    for i in range(9):
        sl = tmp[:, jnp.asarray([3 * i, 3 * i + 1, 3 * i + 2])]
        Wt_dc = sl if Wt_dc is None else Wt_dc + sl              # (K, 3)
    rhs_l = gl - _grouped_reduce(Wt_dc, st.pt_groups, st.pt_tail)
    dl_new = _flat_mm(C, rhs_l, 3, 3, 1)                         # (Ns, 3)
    dl = jnp.zeros((N, 3), dtype=dt)
    dl = dl.at[jnp.asarray(st.point_perm[:Ns])].set(dl_new)
    return dc, dl


def ba_optimize(prob: bal_mod.BalProblem, params: Optional[LMParams] = None,
                verbose: bool = False, dtype=None, mixed_precision: bool = False):
    """Full BAL bundle adjustment: LM with Schur elimination.

    Returns (values_dict, info).  Reference flow: timing/timeSFMBAL.h (LM with
    MULTIFRONTAL + Schur via dense elimination ordering putting points first).
    """
    params = params or LMParams()
    dt = dtype or _default_dtype()
    x64 = jax.config.jax_enable_x64
    hi = jnp.float64 if x64 else dt
    st, order = SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                     prob.num_cameras, prob.num_points)
    uv = jnp.asarray(prob.obs_uv[order], dtype=hi)

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

    # TWO-PHASE precision schedule (SURVEY §7 'f32 + refinement', measured on
    # the Ladybug-1723 shape):
    #   coarse: f32 forward pass + f32 Schur algebra + f32 Cholesky — full
    #     MXU speed; its f32-assembled reduced system caps accuracy ~3e-4
    #     above the optimum (LM accepts stop paying)
    #   fine:   f64 forward pass + f64 Schur assembly, factorization still
    #     f32 on the MXU with f64 iterative refinement — converges to the
    #     reference optimum (measured half-chi2 329,898 < reference 329,909)
    # chi2 is always accumulated in f64 (f32 sum noise at 1.1M terms is the
    # same order as the final LM decrements).
    @jax.jit
    def error_fn(cams, pts):
        cam_k, pt_k = gather(cams, pts)
        r = factors_mod.residuals(batch, (cam_k, pt_k))
        r = r.astype(hi)
        return 0.5 * jnp.sum(r * r)

    # chunked linearize: 550k vmapped jacfwds materialize multi-GB
    # intermediate chains; the f64-emulated fine phase blew past HBM
    # (measured 20.5 GB).  lax.map over NCH chunks bounds the temp to
    # 1/NCH of that while outputs stream into the full (K,...) buffers.
    Kk = len(st.obs_cam)
    NCH = 8
    CHK = -(-Kk // NCH)
    pad_idx = np.concatenate([
        np.arange(Kk, dtype=np.int64),
        np.zeros(NCH * CHK - Kk, dtype=np.int64)])
    obs_cam_ch = jnp.asarray(st.obs_cam[pad_idx].reshape(NCH, CHK))
    obs_pt_ch = jnp.asarray(st.obs_pt[pad_idx].reshape(NCH, CHK))
    uv_ch = uv[jnp.asarray(pad_idx)].reshape(NCH, CHK, 2)

    def make_phase(pdt):
        # coarse (f32) phase: plain f32 Cholesky — its accuracy floor is hit
        # long before the refinement would matter, and skipping the f64
        # refinement keeps the fused step program comfortably inside HBM
        mp_phase = mixed_precision and pdt != jnp.float32

        # fine phase: Jacobians stay f32 (measured equivalent at convergence;
        # hi jacfwd is the expensive part of an emulated-f64 linearize), only
        # the residual forward pass and the downstream Schur assembly are hi
        fwd_dt = pdt if pdt == dt else None

        @jax.jit
        def linearize_fn(cams, pts):
            def one_chunk(args):
                oc, op, m = args
                cam_k = jax.tree.map(lambda a: a[oc], cams)
                pt_k = pts[op]
                (A_cam, A_pt), b = factors_mod.linearize(
                    batch, (cam_k, pt_k), forward_dtype=fwd_dt,
                    out_dtype=pdt, measurements=m)
                return A_cam, A_pt, b

            Ac, Ap, b = jax.lax.map(one_chunk,
                                    (obs_cam_ch, obs_pt_ch, uv_ch))
            return (Ac.reshape(NCH * CHK, 2, 9)[:Kk],
                    Ap.reshape(NCH * CHK, 2, 3)[:Kk],
                    b.reshape(NCH * CHK, 2)[:Kk])

        @partial(jax.jit, static_argnums=(6,))
        def try_step(cams, pts, A_cam, A_pt, b, lam, diagonal_damping):
            dc, dl = schur_solve(st, A_cam, A_pt, b, lam, diagonal_damping,
                                 mixed_precision=mp_phase)
            new_cams = jax.vmap(bal_retract)(cams, dc.astype(hi))
            new_pts = pts + dl.astype(hi)
            return new_cams, new_pts, error_fn(new_cams, new_pts)

        return linearize_fn, try_step

    phases = {dt: make_phase(dt)}
    if hi != dt:
        phases[hi] = None   # built lazily on first fine-phase iteration
    pdt = dt
    # switch to the fine phase when coarse progress stalls (relative decrease
    # below ~10x the coarse accuracy floor) or a lambda sweep fails outright
    switch_tol = 3e-3

    cams = BalCamera(SE3(jnp.asarray(prob.cam_R, dtype=hi),
                         jnp.asarray(prob.cam_t, dtype=hi)),
                     jnp.asarray(prob.cam_calib, dtype=hi))
    pts = jnp.asarray(prob.points, dtype=hi)

    import time as _time
    error = float(error_fn(cams, pts))
    history = [error]
    iter_times = []
    phase_of_iter = []
    lam = params.lambda_initial
    it = 0
    converged = False
    for it in range(1, params.max_iterations + 1):
        _t0 = _time.time()
        if phases[pdt] is None:
            phases[pdt] = make_phase(pdt)
        linearize_fn, try_step = phases[pdt]
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
        phase_of_iter.append(str(jnp.dtype(pdt)))
        if verbose:
            print(f"BA iter {it} [{jnp.dtype(pdt)}]: {prev:.6g} -> {error:.6g} "
                  f"lambda={lam:.3g} ({iter_times[-1]:.2f}s)", flush=True)
        history.append(error)
        if pdt == dt and hi != dt and (
                not accepted or (prev - error) < switch_tol * prev):
            pdt = hi
            lam = min(lam, params.lambda_initial)
            if not accepted:
                continue   # retry this iteration in the fine phase
        if not accepted:
            break
        if check_convergence(prev, error, params):
            converged = True
            break
    return dict(cams=cams, points=pts), dict(
        error=error, iterations=it, converged=converged, history=history,
        iter_times=iter_times, phases=phase_of_iter)
