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
from ..base import reductions
from ..base import twofloat as tf
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

    def device_ops(self):
        """Device-resident operand dict for the jitted solve step.

        The plan's index arrays are LARGE (pair products are O(sum l^2) ~ 2M+
        rows at Ladybug scale).  Closing over them embeds them as literals in
        the lowered StableHLO, which costs ~60-90 s of lowering/hashing PER
        PROCESS (measured round 4) even when the compiled executable comes
        from the persistent cache — so every jitted entry point takes this
        dict as a runtime argument instead."""
        ops = {
            "obs_cam": jnp.asarray(self.obs_cam),
            "obs_pt": jnp.asarray(self.obs_pt),
            "obs_pt_new": jnp.asarray(self.obs_pt_new),
            "cam_pad_idx": jnp.asarray(self.cam_pad_idx),
            "cam_ids": jnp.asarray(self.cam_ids),
        }
        Ns = int(self.obs_pt_new[-1]) + 1 if len(self.obs_pt_new) else 0
        ops["point_perm_ns"] = jnp.asarray(self.point_perm[:Ns])
        if self.pt_tail is not None:
            ops["pt_tail_seg"] = jnp.asarray(self.pt_tail[1])
        M = self.num_cameras
        if self.sym_groups and self.sym_pad_idx is not None:
            ia, ib, swap, diagp = self.sym_groups
            ops["sym_ia"] = jnp.asarray(ia)
            ops["sym_ib"] = jnp.asarray(ib)
            ops["sym_swap"] = jnp.asarray(swap)
            ops["sym_diagp"] = jnp.asarray(diagp)
            ops["sym_pad_idx"] = jnp.asarray(self.sym_pad_idx)
            ca_h, cb_h = np.divmod(self.sym_cells, M)
            ops["sym_ca"] = jnp.asarray(ca_h.astype(np.int32))
            ops["sym_cb"] = jnp.asarray(cb_h.astype(np.int32))
        else:
            # general (directed-pair) path operands — only needed when the
            # sym plan is unavailable (a track longer than _GROUP_CAP)
            ops["pair_a"] = jnp.asarray(self.pair_a)
            ops["pair_b"] = jnp.asarray(self.pair_b)
            ca_h, cb_h = np.divmod(self.cell_unique, M)
            ops["cell_ca"] = jnp.asarray(ca_h.astype(np.int32))
            ops["cell_cb"] = jnp.asarray(cb_h.astype(np.int32))
            if self.cell_tail is not None:
                ops["cell_tail_seg"] = jnp.asarray(self.cell_tail[1])
        return ops


_GROUP_CAP = 64

# (signature) -> {"error_fn": jit, "phase": {dtype_str: (linearize, solve,
# apply)}} — see ba_optimize; bounded to one entry (executables are large)
_STEP_FN_CACHE = {}

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


# pow2-padded contiguous reductions live in base/reductions.py (shared with
# the supernodal refinement matvec); keep the private names for this module
_pow2_pad_plan = reductions.pow2_pad_plan
_padded_reduce = reductions.padded_reduce


def _grouped_reduce(rows, groups, tail, tail_seg=None):
    """Sum sorted contiguous runs: rows (K, W) -> (num_runs, W).

    tail_seg: optional device-resident segment ids for the tail (passed as a
    jit operand; falls back to embedding tail[1] as a constant)."""
    W = rows.shape[1]
    outs = []
    for (r0, n, l) in groups:
        outs.append(rows[r0:r0 + n * l].reshape(n, l, W).sum(1))
    if tail is not None:
        t0, seg_ids, nseg = tail
        seg = tail_seg if tail_seg is not None else jnp.asarray(seg_ids)
        outs.append(jax.ops.segment_sum(rows[t0:], seg, nseg))
    if not outs:
        return jnp.zeros((0, W), dtype=rows.dtype)
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def _pad_rows(a, n_to):
    """Zero-pad the leading dim of `a` up to n_to rows."""
    pad = n_to - a.shape[0]
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], dtype=a.dtype)])


_ROW_CHUNK = 1 << 15


def _row_chunk_size():
    """Row-chunk length for lax.map bodies (env-overridable so tests can
    exercise the padded multi-chunk path at small K)."""
    import os as _os
    return int(_os.environ.get("GTSAM_TPU_ROW_CHUNK", _ROW_CHUNK))


def _row_chunked(f, args, chunk=None, pad_out=False):
    """Apply `f` to row-chunks of `args` via lax.map; concat the outputs.

    Why: XLA's TPU backend UNROLLS flat-lane relayout ops (static lane
    gathers/permutes and last-dim splits) over row tiles — code size grows
    linearly with rows (~25 MB per 1M-row lane permute, measured round 4).
    Emitting the op once inside a lax.map body bounds the program to one
    chunk's worth of code while keeping HBM traffic identical.  All of
    schur_solve's per-row lane algebra goes through here.

    pad_out=True returns the FULL padded (nch*chunk, ...) outputs with the
    pad tail zeroed instead of slicing [:K]: the unaligned [:K] slice forces
    a row-misaligned relayout into every consumer (~4x executable-size
    inflation per consumer, measured round 4).  Callers must only reference
    rows < K (plan indices already do).
    """
    chunk = chunk or _row_chunk_size()
    K = args[0].shape[0]
    nch = -(-K // chunk)
    if nch <= 1:
        out = f(*args)
        return out if isinstance(out, tuple) else (out,)
    kp = nch * chunk
    padded = tuple(_pad_rows(a, kp) for a in args)

    # fori_loop + aligned dynamic slices into FLAT 2-D carries, NOT lax.map:
    # map stacks chunk outputs into (nch, chunk, W) while-carries whose
    # XLA-chosen layouts force row-proportional unrolled relayouts into
    # every consumer (measured round 4: ~4x executable inflation per
    # consumer; the full Schur step compiled to 300 MB).  Flat row-major
    # carries written at chunk-aligned offsets keep everything natural.
    probe = jax.eval_shape(f, *(jax.ShapeDtypeStruct((chunk,) + a.shape[1:],
                                                     a.dtype)
                                for a in args))
    single = not isinstance(probe, tuple)
    if single:
        probe = (probe,)
    outs0 = tuple(jnp.zeros((kp,) + p.shape[1:], dtype=p.dtype)
                  for p in probe)

    def body(i, outs):
        o = i * chunk
        chunk_args = tuple(
            jax.lax.dynamic_slice(a, (o,) + (0,) * (a.ndim - 1),
                                  (chunk,) + a.shape[1:]) for a in padded)
        res = f(*chunk_args)
        if not isinstance(res, tuple):
            res = (res,)
        return tuple(
            jax.lax.dynamic_update_slice(dst, r,
                                         (o,) + (0,) * (r.ndim - 1))
            for dst, r in zip(outs, res))

    outs = jax.lax.fori_loop(0, nch, body, outs0)
    if not pad_out:
        return tuple(o[:K] for o in outs)
    if kp == K:
        return outs

    def zero_tail(o):
        z = jnp.zeros((kp - K,) + o.shape[1:], dtype=o.dtype)
        return jax.lax.dynamic_update_slice(
            o, z, (K,) + (0,) * (o.ndim - 1))

    return tuple(zero_tail(o) for o in outs)


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


def _inv3x3_flat(h):
    """Adjugate 3x3 inverse on FLAT-LANE storage: (N, 9) -> (N, 9).

    Same math as _inv3x3 without the (N,3,3) round-trip (the last-dim split
    reshape is one of the unrolled relayouts _row_chunked exists to contain)."""
    a, b, c = h[:, 0], h[:, 1], h[:, 2]
    d, e, f = h[:, 3], h[:, 4], h[:, 5]
    g, hh, i = h[:, 6], h[:, 7], h[:, 8]
    A = e * i - f * hh
    B = c * hh - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * hh - e * g
    Hc = b * g - a * hh
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    return jnp.stack([A, B, C, D, E, F, G, Hc, I], axis=1) * inv_det[:, None]


def _dense_spd_solve(S, rhs, mixed_precision=False, refine_iters=2,
                     matvec=None):
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
    from ..linear.dense_blocked import blocked_cholesky, blocked_cho_solve
    d = jnp.clip(jnp.diagonal(S), 1e-12, None)
    s = jax.lax.rsqrt(d)
    Se = S * s[:, None] * s[None, :]
    rhe = rhs * s
    x64 = jax.config.jax_enable_x64
    if not mixed_precision or (S.dtype == jnp.float32 and not x64):
        L = blocked_cholesky(Se)
        return blocked_cho_solve(L, rhe.astype(S.dtype)) * s
    hi = jnp.float64 if x64 else S.dtype
    # HBM discipline (the whole BA fine step must stay < 15.75G): only S (the
    # input) is kept in f64; the equilibrated matrix exists ONLY as the f32
    # factorization operand (the scale+convert fuses, no f64 temp), and the
    # refinement matvec reads row chunks of S directly via dynamic_slice so
    # the transient is CH*n*8B, not n^2*8B
    S32 = (S * s[:, None] * s[None, :]).astype(jnp.float32)
    L32 = blocked_cholesky(S32)
    s_hi = s.astype(hi)

    def precond(r):
        """~S^-1 r via the equilibrated f32 factorization."""
        r32 = (r * s_hi).astype(jnp.float32)
        return s_hi * blocked_cho_solve(L32, r32).astype(hi)

    n = S.shape[0]
    CH = 2048
    nch = -(-n // CH)

    if matvec is not None:
        # caller-provided hi-accuracy matvec (e.g. the implicit Schur form
        # S x = Hpp_d x - WC (W^T x) accumulated in f64 from the f32 factors:
        # refining against it recovers the solution of the EXACT Gram system
        # of the f32 Jacobians, which a matvec against the f32-ROUNDED dense
        # S cannot — measured round 4 as LM stalling 5e-4 above the optimum)
        hi_matvec = matvec
    elif n <= CH:
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
    # with a caller-provided exact matvec the refined iterate is meaningful
    # beyond f32 — keep it (the step quality near convergence depends on it)
    return x if matvec is not None else x.astype(S.dtype)


def _wt27_prod(Wk, xkc):
    """Row-batched W_k^T x_k on flat lanes: W (c, 27) [i*3+j], x (c, 9) ->
    (c, 3).  out lane j = sum_i W[:, 3i+j] * x[:, i]."""
    tmp = Wk * xkc[:, jnp.asarray(np.arange(27) // 3)]           # (c, 27)
    acc = None
    for i in range(9):
        sl = tmp[:, jnp.asarray([3 * i, 3 * i + 1, 3 * i + 2])]
        acc = sl if acc is None else acc + sl                    # (c, 3)
    return acc


def _assemble_S_planes(M, red, cells_a, cells_b, red_swap, Hpp_flat):
    """Assemble the reduced camera matrix S (9M, 9M, parameter-major) from
    per-cell 81-lane block sums.

    Plane-major construction: one lax.map over the 81 (i, j) block-entry
    planes; each step scatters the U cell values (U ~ #unique camera pairs,
    thousands) into an (M, M) plane, mirrors off-diagonal cells when the cell
    list is undirected (red_swap given), and adds the damped Hpp diagonal.
    The final (9,9,M,M) -> (9M,9M) interleave is a cheap 4-D transpose.

    Why not scatter (M*M, 81) flat rows and lane-split at the end: the
    (M*M,81)->(M,M,9,9) relayout is row-proportional UNROLLED code (43 MB at
    M=1723, measured round 4); and an (M,M,9,9) intermediate tile-pads
    (9,9)->(16,128) = 24 GB of HBM.  Planes keep minor dims >= M and all
    lane twiddling on U-row arrays.
    """
    dt = red.dtype
    redT = red.T                                      # (81, U)
    HppT = Hpp_flat.T                                 # (81, M)
    diag = jnp.arange(M, dtype=jnp.int32)
    cells = cells_a * M + cells_b
    if red_swap is not None:
        mirror = cells_b * M + cells_a
        offmask = cells_a != cells_b
        redsT = red_swap.T

        def plane(args):
            rv, rs, hv = args
            p = jnp.zeros((M * M,), dt).at[cells].add(-rv)
            p = p.at[jnp.where(offmask, mirror, cells)].add(
                jnp.where(offmask, -rs, jnp.zeros_like(rs)))
            p = p.at[diag * M + diag].add(hv)
            return p.reshape(M, M)

        S4 = jax.lax.map(plane, (redT, redsT, HppT))  # (81, M, M)
    else:
        def plane(args):
            rv, hv = args
            p = jnp.zeros((M * M,), dt).at[cells].add(-rv)
            p = p.at[diag * M + diag].add(hv)
            return p.reshape(M, M)

        S4 = jax.lax.map(plane, (redT, HppT))
    return S4.reshape(9, 9, M, M).transpose(0, 2, 1, 3).reshape(9 * M, 9 * M)


# ---------------------------------------------------------------------------
# Two-float (hi, lo f32 pair) variants of the flat-lane helpers.
#
# The mixed-precision Gram/gradient/refinement chain used to run in f64;
# XLA emulates f64 on TPU by expanding every op into u32 mantissa sequences
# AT HLO LEVEL, which bloated the BA step program to 42 MB / 80 s fresh
# compile / ~5 s warm-cache load / ~10 s first-execution upload (measured
# round 4).  The same chain on two-float pairs (base/twofloat.py) is native
# f32 VPU code: products of f32 Jacobian entries stay EXACT (Dekker
# two-product) and sums are compensated to ~48 bits — the properties the
# f64 chain existed to provide.  Pairs are threaded as separate (hi, lo)
# arrays so every gather/reshape is a compact f32 op.
# ---------------------------------------------------------------------------


def _df(x):
    """Promote a plain f32 array to a two-float pair."""
    return x, jnp.zeros_like(x)


def _grouped_reduce_df(pair, groups, tail, tail_seg=None):
    """Two-float _grouped_reduce.  Group runs reduce with the compensated
    variadic reducer; tail runs (tracks longer than _GROUP_CAP) sum hi/lo
    components separately (error ~sqrt(L)*2^-24 per segment — still far
    beyond the ~1e-7 chain requirement)."""
    h, l = pair
    W = h.shape[1]
    outs_h, outs_l = [], []
    for (r0, n, ln) in groups:
        rh, rl = reductions.window_sum_df(h[r0:r0 + n * ln],
                                          l[r0:r0 + n * ln], ln)
        outs_h.append(rh)
        outs_l.append(rl)
    if tail is not None:
        t0, seg_ids, nseg = tail
        seg = tail_seg if tail_seg is not None else jnp.asarray(seg_ids)
        L = len(seg_ids)   # rows may carry a zeroed pad tail beyond the runs
        outs_h.append(jax.ops.segment_sum(h[t0:t0 + L], seg, nseg))
        outs_l.append(jax.ops.segment_sum(l[t0:t0 + L], seg, nseg))
    if not outs_h:
        z = jnp.zeros((0, W), dtype=h.dtype)
        return z, z
    if len(outs_h) == 1:
        return outs_h[0], outs_l[0]
    return jnp.concatenate(outs_h), jnp.concatenate(outs_l)


_padded_reduce_df = reductions.padded_reduce_df


def _lane_rep(a, k):
    """Repeat each lane k times (the arange(n*k)//k selection) via
    broadcast+reshape — no gather."""
    return jnp.broadcast_to(a[..., :, None], a.shape + (k,)).reshape(
        *a.shape[:-1], a.shape[-1] * k)


def _lane_tile(a, k):
    """Tile the lane block k times (the arange%n selection) via
    broadcast+reshape — no gather."""
    return jnp.broadcast_to(
        a[..., None, :], a.shape[:-1] + (k, a.shape[-1])).reshape(
        *a.shape[:-1], a.shape[-1] * k)


def _lane_sel(Z, lanes):
    """Static lane selection Z[:, lanes] lowered as a strided slice when the
    pattern is arithmetic (start + stride*arange) — slices carry far less
    lowering weight than gathers in the chunk bodies."""
    n = len(lanes)
    if n == 1:
        return jax.lax.slice(Z, (0, int(lanes[0])),
                             (Z.shape[0], int(lanes[0]) + 1))
    d = int(lanes[1]) - int(lanes[0])
    if d > 0 and np.array_equal(lanes, lanes[0] + d * np.arange(n)):
        return jax.lax.slice(
            Z, (0, int(lanes[0])),
            (Z.shape[0], int(lanes[0]) + d * (n - 1) + 1), (1, d))
    return Z[:, jnp.asarray(lanes)]


def _flat_mm_df(X, Y, p, q, r):
    """Two-float _flat_mm: X, Y are (hi, lo) pairs of flat-lane row-batched
    matrices; returns the (p, r) product as a pair."""
    Xh, Xl = X
    Yh, Yl = Y
    pr_lanes = np.arange(p * r)
    out = None
    for j in range(q):
        A = (pr_lanes // r) * q + j
        B = j * r + pr_lanes % r
        xa_h, xa_l = _lane_sel(Xh, A), _lane_sel(Xl, A)

        def sel_b(Z):
            # B is tile(j*r + arange(r), p): slice the r lanes once and
            # broadcast across the p repeats (reshape+broadcast, no gather)
            s = jax.lax.slice(Z, (0, j * r), (Z.shape[0], j * r + r))
            if p == 1:
                return s
            return jnp.broadcast_to(s[:, None, :],
                                    (Z.shape[0], p, r)).reshape(-1, p * r)

        yb_h, yb_l = sel_b(Yh), sel_b(Yl)
        t = tf.mul(xa_h, xa_l, yb_h, yb_l)
        out = t if out is None else tf.add(*out, *t)
    return out


def _wt27_prod_df(W, x):
    """Two-float _wt27_prod: W (c, 27) pair, x (c, 9) pair -> (c, 3) pair."""
    Wh, Wl = W
    xh, xl = x

    def rep3(z):   # lane i repeated 3x: broadcast, not gather
        c = z.shape[0]
        return jnp.broadcast_to(z[:, :, None], (c, 9, 3)).reshape(c, 27)

    th, tl = tf.mul(Wh, Wl, rep3(xh), rep3(xl))
    acc = None
    for i in range(9):
        sl = np.asarray([3 * i, 3 * i + 1, 3 * i + 2])
        t = (_lane_sel(th, sl), _lane_sel(tl, sl))
        acc = t if acc is None else tf.add(*acc, *t)
    return acc


def _inv3x3_flat_df(hp):
    """Two-float adjugate 3x3 inverse on flat-lane storage."""
    h, l = hp

    def e(i):
        return h[:, i], l[:, i]

    a, b, c = e(0), e(1), e(2)
    d, ee, f = e(3), e(4), e(5)
    g, hh, i = e(6), e(7), e(8)

    def m(x, y):
        return tf.mul(*x, *y)

    def s(x, y):
        return tf.sub(*x, *y)

    A = s(m(ee, i), m(f, hh))
    B = s(m(c, hh), m(b, i))
    C = s(m(b, f), m(c, ee))
    D = s(m(f, g), m(d, i))
    E = s(m(a, i), m(c, g))
    F = s(m(c, d), m(a, f))
    G = s(m(d, hh), m(ee, g))
    Hc = s(m(b, g), m(a, hh))
    I = s(m(a, ee), m(b, d))
    det = tf.add(*tf.add(*m(a, A), *m(b, D)), *m(c, G))
    inv_det = tf.recip(*det)
    cols = [A, B, C, D, E, F, G, Hc, I]
    outs = [tf.mul(*x, *inv_det) for x in cols]
    return (jnp.stack([o[0] for o in outs], axis=1),
            jnp.stack([o[1] for o in outs], axis=1))


def _dense_spd_solve_df(S, rhs, matvec, refine_iters=3):
    """f32 equilibrated blocked-Cholesky factorization + two-float iterative
    refinement against a caller-provided two-float matvec (the exact-Gram
    implicit Schur form).  rhs is a (hi, lo) pair; returns a pair."""
    from ..linear.dense_blocked import blocked_cholesky, blocked_cho_solve
    d = jnp.clip(jnp.diagonal(S), 1e-12, None)
    s = jax.lax.rsqrt(d)
    S32 = S * s[:, None] * s[None, :]
    L32 = blocked_cholesky(S32)

    def precond(r32):
        return s * blocked_cho_solve(L32, r32 * s)

    # refinement under lax.fori_loop: the matvec (three 550k-row gather
    # chains) and the panelled cho_solve appear ONCE in the program instead
    # of once per refinement pass (a python loop triplicated them: ~10 MB of
    # executable per pass, measured round 4).  Starting from x = 0 folds the
    # initial solve into the first pass (mv(0) = 0), removing the second
    # cho_solve instantiation at the cost of one cheap matvec.
    def refine(_, x):
        mv = matvec(x)
        r = tf.sub(rhs[0], rhs[1], mv[0], mv[1])
        return tf.add(*x, *_df(precond(tf.to_f32(*r))))

    zero = _df(jnp.zeros_like(rhs[0]))
    return jax.lax.fori_loop(0, refine_iters + 1, refine, zero)


def _schur_solve_df(st: SchurStructure, A_cam, A_pt, b, lam,
                    diagonal_damping=False, ops=None, _stage=None):
    """Mixed-precision Schur solve with the high-accuracy chain in two-float
    f32 pairs (see module comment above; replaces the emulated-f64 chain).

    A_cam (K,2,9), A_pt (K,2,3) f32; b (K,2) f64 (from the hi forward pass)
    or f32.  The factorization runs f32 on the MXU; everything the round-4
    measurements showed must be exact — Gram products, reductions, landmark
    inverses, coupling, pair products, gradients, the refinement matvec —
    runs on pairs.  Returns (delta_cam (M,9) f64, delta_pt (N,3) f32)."""
    M, N = st.num_cameras, st.num_points
    if ops is None:
        ops = st.device_ops()
    dt = A_cam.dtype
    seg_cam = ops["obs_cam"]
    obs_pt_new = ops["obs_pt_new"]
    pt_tail_seg = ops.get("pt_tail_seg")

    if b.dtype == dt:
        b_h, b_l = b, jnp.zeros_like(b)
    else:
        b_h, b_l = tf.from_f64(b)

    def cam_reduce_df(pair):
        return _padded_reduce_df(pair, ops["cam_pad_idx"], st.cam_buckets,
                                 M, ops["cam_ids"])

    def obs_prods(ac, ap, bh, bl):
        def prods(x, y):
            p0 = tf.two_prod(x[:, 0], y[:, 0])
            p1 = tf.two_prod(x[:, 1], y[:, 1])
            return tf.add(*p0, *p1)

        def gchain(x):
            g0 = tf.mul_f(bh[:, 0, None], bl[:, 0, None], x[:, 0])
            g1 = tf.mul_f(bh[:, 1, None], bl[:, 1, None], x[:, 1])
            return tf.add(*g0, *g1)

        # outer-product lane expansion by broadcast (arange//k is a repeat,
        # arange%k a tile) — no gathers inside the chunk body
        hll = prods(_lane_rep(ap, 3), _lane_tile(ap, 3))       # (c, 9) pair
        glc = gchain(ap)                                       # (c, 3) pair
        hpp = prods(_lane_rep(ac, 9), _lane_tile(ac, 9))       # (c, 81)
        gpc = gchain(ac)                                       # (c, 9)
        Wc = prods(_lane_rep(ac, 3), _lane_tile(ap, 9))        # (c, 27)
        return (*hll, *glc, *hpp, *gpc, *Wc)

    # pad_out: all per-observation arrays keep the chunk-padded row count
    # (zeroed tail) — the unaligned [:K] slice otherwise forces a
    # row-misaligned relayout into every consumer (~4x executable size per
    # consumer, measured round 4).  All plan indices reference rows < K.
    (hll_h, hll_l, gl_h, gl_l, hpp_h, hpp_l, gp_h, gp_l,
     W_h, W_l) = _row_chunked(obs_prods, (A_cam, A_pt, b_h, b_l),
                              pad_out=True)
    Kr = hll_h.shape[0]
    Ko = len(st.obs_cam)
    if Kr != Ko:
        zpad = jnp.zeros(Kr - Ko, dtype=seg_cam.dtype)
        seg_cam_x = jnp.concatenate([seg_cam, zpad])
        obs_pt_new_x = jnp.concatenate(
            [obs_pt_new, zpad.astype(obs_pt_new.dtype)])
    else:
        seg_cam_x, obs_pt_new_x = seg_cam, obs_pt_new
    if _stage == "prods":
        return hll_h, gl_h, hpp_h, gp_h, W_h
    Hll = _grouped_reduce_df((hll_h, hll_l), st.pt_groups, st.pt_tail,
                             pt_tail_seg)
    gl = _grouped_reduce_df((gl_h, gl_l), st.pt_groups, st.pt_tail,
                            pt_tail_seg)
    Hpp = cam_reduce_df((hpp_h, hpp_l))
    gp = cam_reduce_df((gp_h, gp_l))
    if _stage == "gram":
        return Hll[0], gl[0], Hpp[0], gp[0], W_h

    # damping magnitudes are policy, not precision: computed in f32
    if diagonal_damping:
        hdiag = (Hll[0][:, 0] + Hll[0][:, 4] + Hll[0][:, 8]) / 3.0
        lam_eff = hdiag[:, None] * lam
    else:
        lam_eff = jnp.full((Hll[0].shape[0], 1), lam, dtype=dt)
    diag_lanes = jnp.asarray((_I3 == _J3).astype(np.float32)).astype(dt)

    def landmark_solve(hh, hl, gh, gl_, le):
        damped = tf.add_f(hh, hl, le * diag_lanes[None, :])
        Cc = _inv3x3_flat_df(damped)
        Cgc = _flat_mm_df(Cc, (gh, gl_), 3, 3, 1)
        return (*Cc, *Cgc)

    C_h, C_l, Cg_h, Cg_l = _row_chunked(
        landmark_solve, (Hll[0], Hll[1], gl[0], gl[1], lam_eff),
        pad_out=True)

    Cgk = (Cg_h[obs_pt_new_x], Cg_l[obs_pt_new_x])
    Ck = (C_h[obs_pt_new_x], C_l[obs_pt_new_x])

    def coupling(Wh, Wl, cgh, cgl, ch, cl):
        corr = _flat_mm_df((Wh, Wl), (cgh, cgl), 9, 3, 1)
        WCp = _flat_mm_df((Wh, Wl), (ch, cl), 9, 3, 3)
        return (*corr, *WCp)

    corr_h, corr_l, WC_h, WC_l = _row_chunked(
        coupling, (W_h, W_l, Cgk[0], Cgk[1], Ck[0], Ck[1]), pad_out=True)
    gp_t = tf.sub(gp[0], gp[1], *cam_reduce_df((corr_h, corr_l)))
    if _stage == "coupling":
        return gp_t[0], WC_h

    # reduced camera matrix pair products (see schur_solve for the layout
    # rationale; identical plan, two-float arithmetic)
    if st.sym_groups:
        _T81 = (np.arange(81).reshape(9, 9).T).reshape(-1)
        _, _, swap_h, diagp_h = st.sym_groups
        wcp = (WC_h[ops["sym_ia"]], WC_l[ops["sym_ia"]])
        wvp = (W_h[ops["sym_ib"]], W_l[ops["sym_ib"]])
        diag_any = bool(diagp_h.any())

        def _s3(Z, o):   # lanes [o, o+3, ..., o+24]: stride-3 slice
            return jax.lax.slice(Z, (0, o), (Z.shape[0], o + 25), (1, 3))

        def pair_prod(wch, wcl, wvh, wvl, sw, dp):
            pr = None
            for o in (0, 1, 2):
                t = tf.mul(_lane_rep(_s3(wch, o), 9),
                           _lane_rep(_s3(wcl, o), 9),
                           _lane_tile(_s3(wvh, o), 9),
                           _lane_tile(_s3(wvl, o), 9))
                pr = t if pr is None else tf.add(*pr, *t)
            prh, prl = pr
            T = jnp.asarray(_T81)
            prTh, prTl = prh[:, T], prl[:, T]
            oh = jnp.where(sw[:, None], prTh, prh)
            ol = jnp.where(sw[:, None], prTl, prl)
            if diag_any:
                dh, dl = tf.add(prh, prl, prTh, prTl)
                oh = jnp.where(dp[:, None], dh, oh)
                ol = jnp.where(dp[:, None], dl, ol)
            return oh, ol

        out_h, out_l = _row_chunked(
            pair_prod, (wcp[0], wcp[1], wvp[0], wvp[1],
                        ops["sym_swap"], ops["sym_diagp"]), pad_out=True)
        idx = ops["sym_pad_idx"]
        ext_h = jnp.concatenate(
            [out_h, jnp.zeros((1, 81), dtype=out_h.dtype)])[idx]
        ext_l = jnp.concatenate(
            [out_l, jnp.zeros((1, 81), dtype=out_l.dtype)])[idx]
        rh_parts, rl_parts = [], []
        for (p0, nr, Pw) in st.sym_buckets:
            rh, rl = reductions.window_sum_df(ext_h[p0:p0 + nr * Pw],
                                              ext_l[p0:p0 + nr * Pw], Pw)
            rh_parts.append(rh)
            rl_parts.append(rl)
        red_h = (jnp.concatenate(rh_parts) if len(rh_parts) > 1
                 else rh_parts[0])
        red_l = (jnp.concatenate(rl_parts) if len(rl_parts) > 1
                 else rl_parts[0])
        red32 = red_h + red_l
        if _stage == "red":
            return red32, gp_t[0]
        red_swap32 = red32[:, jnp.asarray(_T81)]
        cells_a, cells_b = ops["sym_ca"], ops["sym_cb"]
    else:
        pa_all = ops["pair_a"]
        pb_all = ops["pair_b"]

        def _s3g(Z, o):
            return jax.lax.slice(Z, (0, o), (Z.shape[0], o + 25), (1, 3))

        def _pair_prod(wch, wcl, wh, wl):
            pr = None
            for o in (0, 1, 2):
                t = tf.mul(_lane_rep(_s3g(wch, o), 9),
                           _lane_rep(_s3g(wcl, o), 9),
                           _lane_tile(_s3g(wh, o), 9),
                           _lane_tile(_s3g(wl, o), 9))
                pr = t if pr is None else tf.add(*pr, *t)
            return pr

        pr_h, pr_l = _row_chunked(
            _pair_prod, (WC_h[pa_all], WC_l[pa_all],
                         W_h[pb_all], W_l[pb_all]))
        parts_h, parts_l = [], []
        for (p0, n, ln) in st.cell_groups:
            rh, rl = reductions.window_sum_df(pr_h[p0:p0 + n * ln],
                                              pr_l[p0:p0 + n * ln], ln)
            parts_h.append(rh)
            parts_l.append(rl)
        if st.cell_tail is not None:
            t0, seg_ids, nseg = st.cell_tail
            tail_seg = ops.get("cell_tail_seg")
            if tail_seg is None:
                tail_seg = jnp.asarray(seg_ids)
            parts_h.append(jax.ops.segment_sum(pr_h[t0:], tail_seg, nseg))
            parts_l.append(jax.ops.segment_sum(pr_l[t0:], tail_seg, nseg))
        if parts_h:
            red32 = ((jnp.concatenate(parts_h) if len(parts_h) > 1
                      else parts_h[0])
                     + (jnp.concatenate(parts_l) if len(parts_l) > 1
                        else parts_l[0]))
        else:
            red32 = jnp.zeros((0, 81), dtype=dt)
        red_swap32 = None
        cells_a, cells_b = ops["cell_ca"], ops["cell_cb"]

    diag81 = jnp.asarray((_I9 == _J9).astype(np.float32)).astype(dt)
    if diagonal_damping:
        Hpp_d = tf.mul_f(Hpp[0], Hpp[1], (1.0 + lam * diag81)[None, :])
    else:
        Hpp_d = tf.add_f(Hpp[0], Hpp[1], lam * diag81[None, :])

    S = _assemble_S_planes(M, red32, cells_a, cells_b, red_swap32,
                           tf.to_f32(*Hpp_d))
    if _stage == "S":
        return S, tf.to_f32(*gp_t)

    def matvec(xp):
        """Two-float implicit Schur matvec (param-major (9M,) pair):
        S x = Hpp_d x - sum_k WC_k (sum_{k' in track(k)} W_k'^T x_k').
        Exact-Gram: reference analog RegularImplicitSchurFactor.h:272."""
        Xh = xp[0].reshape(9, M).T
        Xl = xp[1].reshape(9, M).T
        xk = (Xh[seg_cam_x], Xl[seg_cam_x])
        tk_h, tk_l = _row_chunked(
            lambda wh, wl, xh_, xl_: _wt27_prod_df((wh, wl), (xh_, xl_)),
            (W_h, W_l, xk[0], xk[1]), pad_out=True)
        u = _grouped_reduce_df((tk_h, tk_l), st.pt_groups, st.pt_tail,
                               pt_tail_seg)
        uk = (u[0][obs_pt_new_x], u[1][obs_pt_new_x])
        vk_h, vk_l = _row_chunked(
            lambda wch, wcl, uh, ul: _flat_mm_df((wch, wcl), (uh, ul),
                                                 9, 3, 1),
            (WC_h, WC_l, uk[0], uk[1]), pad_out=True)
        HX = _flat_mm_df(Hpp_d, (Xh, Xl), 9, 9, 1)
        y = tf.sub(HX[0], HX[1], *cam_reduce_df((vk_h, vk_l)))
        return (y[0].T.reshape(-1), y[1].T.reshape(-1))

    rhs_p = (gp_t[0].reshape(M, 9).T.reshape(-1),
             gp_t[1].reshape(M, 9).T.reshape(-1))
    dcp = _dense_spd_solve_df(S, rhs_p, matvec, refine_iters=3)
    dc_pair = (dcp[0].reshape(9, M).T, dcp[1].reshape(9, M).T)
    dc = (dc_pair[0].astype(jnp.float64)
          + dc_pair[1].astype(jnp.float64)) if \
        jax.config.jax_enable_x64 else tf.to_f32(*dc_pair)

    # landmark back-substitution: dl = C (gl - W^T dc), two-float
    dck = (dc_pair[0][seg_cam_x], dc_pair[1][seg_cam_x])
    wt_h, wt_l = _row_chunked(
        lambda wh, wl, xh_, xl_: _wt27_prod_df((wh, wl), (xh_, xl_)),
        (W_h, W_l, dck[0], dck[1]), pad_out=True)
    wred = _grouped_reduce_df((wt_h, wt_l), st.pt_groups, st.pt_tail,
                              pt_tail_seg)
    rhs_l = tf.sub(gl[0], gl[1], wred[0], wred[1])
    Nsr = C_h.shape[0]
    dl_h, dl_l = _row_chunked(
        lambda ch, cl, rh, rl: _flat_mm_df((ch, cl), (rh, rl), 3, 3, 1),
        (C_h, C_l, _pad_rows(rhs_l[0], Nsr), _pad_rows(rhs_l[1], Nsr)),
        pad_out=True)
    Ns_ = len(st.obs_pt_new) and int(st.obs_pt_new[-1]) + 1
    dl_new = (dl_h + dl_l)[:Ns_]
    dl = jnp.zeros((N, 3), dtype=dt)
    dl = dl.at[ops["point_perm_ns"]].set(dl_new)
    return dc, dl


def schur_solve(st: SchurStructure, A_cam, A_pt, b, lam, diagonal_damping=False,
                mixed_precision=False, ops=None, _stage=None):
    """Solve the damped GN system by landmark elimination.

    A_cam: (K, 2, 9), A_pt: (K, 2, 3), b: (K, 2) — whitened, in st's grouped
    observation order.  Returns (delta_cam (M,9), delta_pt (N,3) in ORIGINAL
    point numbering).  All block algebra runs in flat-lane layout (81/27/9
    wide) and all point/cell reductions are contiguous reshape-reduces.

    ops: st.device_ops() passed through the jit boundary as runtime operands
    (required under jit at scale — closed-over plan arrays would be embedded
    as HLO literals, costing ~90 s of lowering per process).  When None the
    operands are materialized from st (eager/small-problem convenience).
    """
    M, N = st.num_cameras, st.num_points
    if ops is None:
        ops = st.device_ops()
    dt = A_cam.dtype
    seg_cam = ops["obs_cam"]
    obs_pt_new = ops["obs_pt_new"]
    Ns = int(st.obs_pt_new[-1]) + 1 if len(st.obs_pt_new) else 0
    pt_tail_seg = ops.get("pt_tail_seg")

    def cam_reduce(rows):
        return _padded_reduce(rows, ops["cam_pad_idx"], st.cam_buckets, M,
                              ops["cam_ids"])

    # MIXED-RHS mode (b arrives in a higher dtype than A): the Jacobians
    # arrive f32 and the FACTORIZATION runs f32 on the MXU, but the entire
    # Gram/gradient chain (Hll, Hpp, W, C, WC, pair products, gl, gp, rhs)
    # must be EXACT in the f32 Jacobian entries — measured round 4: with any
    # of these pieces rounded to f32, LM floors 6e-4 above the reference
    # optimum (f32 product rounding feeds the heavily cancelling Schur
    # complement).  The exact chain runs on TWO-FLOAT f32 pairs
    # (_schur_solve_df): the original emulated-f64 version of the same chain
    # bloated the step program to 42 MB / 80 s fresh compile / ~15 s of
    # per-process load even on a warm persistent cache.
    bt = b.dtype
    rhs_hi = bt != dt
    if mixed_precision and rhs_hi:
        return _schur_solve_df(st, A_cam, A_pt, b, lam, diagonal_damping,
                               ops, _stage)
    gt_ = bt if rhs_hi else dt   # Gram dtype

    # per-observation flat-lane products, row-chunked (see _row_chunked: the
    # lane gathers would otherwise unroll into row-proportional code)
    def obs_prods(ac, ap, bb):
        ac = ac.astype(gt_)
        ap = ap.astype(gt_)
        hll = (ap[:, :, _I3] * ap[:, :, _J3]).sum(1)             # (c, 9)
        glc = jnp.einsum("kri,kr->ki", ap, bb)                   # (c, 3)
        hpp = (ac[:, :, _I9] * ac[:, :, _J9]).sum(1)             # (c, 81)
        gpc = jnp.einsum("kri,kr->ki", ac, bb)                   # (c, 9)
        Wc = (ac[:, :, _I93] * ap[:, :, _J93]).sum(1)            # (c, 27)
        return hll, glc, hpp, gpc, Wc

    hll_k, gl_k, hpp_k, gp_k, W = _row_chunked(
        obs_prods, (A_cam, A_pt, b))
    Hll = _grouped_reduce(hll_k, st.pt_groups, st.pt_tail, pt_tail_seg)
    gl = _grouped_reduce(gl_k, st.pt_groups, st.pt_tail, pt_tail_seg)

    # per-camera diagonal blocks + gradients (pow2-padded contiguous
    # reductions — no duplicate-index scatter)
    if rhs_hi:
        Hpp = cam_reduce(hpp_k)
        gp = cam_reduce(gp_k)
    else:
        cam_red = cam_reduce(jnp.concatenate([hpp_k, gp_k], axis=1))
        Hpp, gp = cam_red[:, :81], cam_red[:, 81:]

    if diagonal_damping:
        hdiag = (Hll[:, 0] + Hll[:, 4] + Hll[:, 8]) / 3.0
        lam_eff = hdiag[:, None] * lam
    else:
        lam_eff = jnp.full((Hll.shape[0], 1), lam, dtype=gt_)
    diag_lanes = jnp.asarray((_I3 == _J3).astype(np.float32)).astype(gt_)

    def landmark_solve(hll, glc, le):
        Cc = _inv3x3_flat(hll + le * diag_lanes[None, :])        # (c, 9)
        Cgc = _flat_mm(Cc, glc, 3, 3, 1)                         # (c, 3)
        return Cc, Cgc

    C, Cg = _row_chunked(landmark_solve, (Hll, gl, lam_eff))

    # reduced gradient: gp_tilde = gp - sum_k W_k C_{pt_k} gl_{pt_k}
    # and coupling products WC_k = W_k C_{pt_k} (flat 27-wide, i*3+l)
    Cgk = Cg[obs_pt_new]
    Ck = C[obs_pt_new]

    def coupling(Wk, cgk, ck):
        return (_flat_mm(Wk, cgk, 9, 3, 1),
                _flat_mm(Wk, ck, 9, 3, 3))

    corr, WC = _row_chunked(coupling, (W, Cgk, Ck))
    gp_t = gp - cam_reduce(corr)
    if _stage == "coupling":
        return gp_t, WC

    # reduced camera matrix: S[ca, cb] -= WC_a W_b^T over track pairs
    # the sym fast path serves BOTH dtypes since round 4: its pair products
    # are row-chunked, so the peak temp is one chunk's worth, not the ~5x
    # full-pair buffer that used to overflow HBM in f64 at Ladybug scale
    if st.sym_groups:
        # fast path: undirected upper pairs; the cell sort is composed into
        # the operand gather indices so product rows are BORN cell-sorted
        # (flat 81-lane products only — (…,9,9) trailing dims tile to 25x
        # HBM padding), then a pow2-padded contiguous bucket reduce; the
        # assemble mirrors off-diagonal cells by lane transpose.
        _T81 = (np.arange(81).reshape(9, 9).T).reshape(-1)
        iW = np.repeat(np.arange(9), 9)
        lW = np.tile(np.arange(9), 9)
        _, _, swap_h, diagp_h = st.sym_groups   # host copies: static checks
        wcp = WC[ops["sym_ia"]]                               # (Ph, 27)
        wvp = W[ops["sym_ib"]]
        diag_any = bool(diagp_h.any())

        def pair_prod(wc, wv, sw, dp):
            pr = wc[:, 3 * iW + 0] * wv[:, 3 * lW + 0]
            pr = pr + wc[:, 3 * iW + 1] * wv[:, 3 * lW + 1]
            pr = pr + wc[:, 3 * iW + 2] * wv[:, 3 * lW + 2]   # (c, 81)
            prT = pr[:, jnp.asarray(_T81)]
            out = jnp.where(sw[:, None], prT, pr)
            if diag_any:
                # same-camera off-diagonal pair inside one track: the
                # directed sum contributes X + X^T to the diagonal cell
                out = jnp.where(dp[:, None], pr + prT, out)
            return out

        (out,) = _row_chunked(pair_prod, (wcp, wvp, ops["sym_swap"],
                                          ops["sym_diagp"]))
        ext = jnp.concatenate([out, jnp.zeros((1, 81), dtype=out.dtype)])
        gat = ext[ops["sym_pad_idx"]]
        red = jnp.concatenate(
            [gat[p0:p0 + nr * Pw].reshape(nr, Pw, 81).sum(1)
             for (p0, nr, Pw) in st.sym_buckets]) \
            if len(st.sym_buckets) > 1 else \
            gat.reshape(st.sym_buckets[0][1], st.sym_buckets[0][2], 81).sum(1)
        red_swap = red[:, jnp.asarray(_T81)]     # mirrored (U rows: tiny)
        cells_a, cells_b = ops["sym_ca"], ops["sym_cb"]
        if _stage == "red":
            return red, red_swap
    else:
        # general path (long-track tail present): directed pairs, grouped by
        # destination cell run so the reduction is contiguous
        iW = np.repeat(np.arange(9), 9)
        lW = np.tile(np.arange(9), 9)
        pa_all = ops["pair_a"]
        pb_all = ops["pair_b"]

        def _pair_prod(wc, w):
            acc = wc[:, 3 * iW + 0] * w[:, 3 * lW + 0]
            acc = acc + wc[:, 3 * iW + 1] * w[:, 3 * lW + 1]
            acc = acc + wc[:, 3 * iW + 2] * w[:, 3 * lW + 2]
            return acc                                           # (p, 81)

        (pr_all,) = _row_chunked(_pair_prod, (WC[pa_all], W[pb_all]))
        cell_parts = []
        for (p0, n, l) in st.cell_groups:
            cell_parts.append(
                pr_all[p0:p0 + n * l].reshape(n, l, 81).sum(1))
        if st.cell_tail is not None:
            t0, seg_ids, nseg = st.cell_tail
            tail_seg = ops.get("cell_tail_seg")
            if tail_seg is None:
                tail_seg = jnp.asarray(seg_ids)
            cell_parts.append(
                jax.ops.segment_sum(pr_all[t0:], tail_seg, nseg))
        if cell_parts:
            red = (jnp.concatenate(cell_parts)
                   if len(cell_parts) > 1 else cell_parts[0])
        else:
            red = jnp.zeros((0, 81), dtype=gt_)
        red_swap = None                          # directed: both (a,b),(b,a)
        cells_a, cells_b = ops["cell_ca"], ops["cell_cb"]

    # damped camera-diagonal blocks, flat lanes (diag lanes are _I9 == _J9);
    # stays in Hpp's dtype (hi under mixed-rhs, also feeding the matvec)
    diag81 = jnp.asarray((_I9 == _J9).astype(np.float64)).astype(Hpp.dtype)
    if diagonal_damping:
        Hpp_d = Hpp * (1.0 + lam * diag81)[None, :]
    else:
        Hpp_d = Hpp + lam * diag81[None, :]

    # Assemble/solve in the PARAMETER-MAJOR permutation (row index i*M+a
    # instead of a*9+i): a symmetric permutation leaves the Cholesky
    # identical, the camera-major (M,9,M,9) layout would tile-pad 14.3x
    # (12.8 GB at Ladybug scale), and the plane-major construction keeps
    # every relayout compact (see _assemble_S_planes).  The factorization
    # operand is f32 regardless (hi-summed cells round once at the end).
    S = _assemble_S_planes(
        M, red.astype(dt),
        cells_a, cells_b,
        red_swap.astype(dt) if red_swap is not None else None,
        Hpp_d.astype(dt))
    if _stage == "S":
        return S, gp_t

    matvec = None
    if rhs_hi:
        def matvec(xp):
            """Implicit Schur matvec in hi (param-major (9M,) -> (9M,)):
            S x = Hpp_d x - sum_k WC_k (sum_{k' in track(k)} W_k'^T x_k').
            Accumulated in b's dtype from the f32 factors, this is the EXACT
            Gram of the f32 Jacobians — the refinement target the f32-rounded
            dense S cannot provide (reference analog:
            slam/RegularImplicitSchurFactor.h:272 multiplyHessianAdd)."""
            X = xp.reshape(9, M).T.astype(bt)            # (M, 9)
            xk = X[seg_cam]                              # (K, 9) hi
            (tk,) = _row_chunked(
                lambda Wk, xkc: _wt27_prod(Wk, xkc), (W, xk))
            u = _grouped_reduce(tk, st.pt_groups, st.pt_tail, pt_tail_seg)
            uk = u[obs_pt_new]                           # (K, 3) hi
            (vk,) = _row_chunked(
                lambda WCk, ukc: _flat_mm(WCk, ukc, 9, 3, 1), (WC, uk))
            HX = _flat_mm(Hpp_d.astype(bt), X, 9, 9, 1)  # (M, 9) hi
            y = HX - cam_reduce(vk)
            return y.T.reshape(-1)

    # dense factorize + solve (parameter-major rhs/solution)
    rhs_p = gp_t.reshape(M, 9).T.reshape(-1)
    dc = _dense_spd_solve(S, rhs_p, mixed_precision, matvec=matvec,
                          refine_iters=3 if matvec is not None else 2
                          ).reshape(9, M).T

    # back-substitute landmarks: dl = C (gl - W^T dc)
    dck = dc[seg_cam]                                            # (K, 9)
    (Wt_dc,) = _row_chunked(_wt27_prod, (W, dck))
    rhs_l = gl - _grouped_reduce(Wt_dc, st.pt_groups, st.pt_tail, pt_tail_seg)
    (dl_new,) = _row_chunked(
        lambda Cc, rl: _flat_mm(Cc, rl, 3, 3, 1), (C, rhs_l))    # (Ns, 3)
    dl = jnp.zeros((N, 3), dtype=dt)
    dl = dl.at[ops["point_perm_ns"]].set(dl_new.astype(dt))
    return dc, dl


def ba_optimize(prob: bal_mod.BalProblem, params: Optional[LMParams] = None,
                verbose: bool = False, dtype=None, mixed_precision: bool = False,
                target_error: Optional[float] = None):
    """Full BAL bundle adjustment: LM with Schur elimination.

    Returns (values_dict, info).  Reference flow: timing/timeSFMBAL.h (LM with
    MULTIFRONTAL + Schur via dense elimination ordering putting points first).

    target_error: optional absolute half-chi2 stopping target (the
    time-to-converged-chi2 benchmark semantics: stop as soon as the error is
    at or below the reference's converged value).

    All large plan arrays are passed INTO the jitted step functions as runtime
    operands (never closed over): embedded-literal lowering of the ~2M-row
    pair-product plan costs ~90 s per process even on a fully warm persistent
    compilation cache (measured round 4: lower() 63 s for error_fn alone,
    0.1 s trace / 0.5 s cached compile).
    """
    params = params or LMParams()
    dt = dtype or _default_dtype()
    x64 = jax.config.jax_enable_x64
    hi = jnp.float64 if x64 else dt
    st, order = SchurStructure.build(prob.obs_cam, prob.obs_pt,
                                     prob.num_cameras, prob.num_points)
    uv = jnp.asarray(prob.obs_uv[order], dtype=hi)
    ops = st.device_ops()

    # Cross-call step-function cache: a second ba_optimize on the same
    # problem SHAPE reuses the already-loaded executables instead of
    # re-tracing fresh jit objects and re-uploading the big solve program
    # (~6 s at Ladybug scale even with a hot persistent cache).  The key
    # covers every trace-time-static input: dims, plan group tuples,
    # chunking, dtypes, and the precision mode.
    def _sig_of(st_):
        def _b(t):
            return tuple(tuple(int(x) for x in g[:3]) if hasattr(g, "__len__")
                         else int(g) for g in t) if t else ()
        return (st_.num_cameras, st_.num_points, len(st_.obs_cam),
                _b(st_.pt_groups), st_.pt_tail is None,
                _b(st_.cell_groups), st_.cell_tail is None,
                _b(st_.cam_buckets), _b(st_.sym_buckets),
                len(st_.sym_pad_idx) if st_.sym_pad_idx is not None else -1,
                len(st_.pair_a), len(st_.cell_unique))

    batch = factors_mod.custom_factors(
        "ProjectionBal", ("BalCamera", "Point3"),
        np.zeros((1, 2), dtype=np.int64),  # keys unused here
        bal_mod._projection_residual, 2, None, noise_mod.unit())

    obs_cam = ops["obs_cam"]
    obs_pt = jnp.asarray(st.obs_pt)

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
    def error_fn(cams, pts, obs_cam, obs_pt, uv):
        cam_k = jax.tree.map(lambda a: a[obs_cam], cams)
        pt_k = pts[obs_pt]
        r = factors_mod.residuals(batch, (cam_k, pt_k), measurements=uv)
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
        # working-dtype (f32) phase — MIXED-RHS since round 4: Jacobians,
        # quadratic assembly and S in f32, the residual/gradient chain (b,
        # gl, gp, rhs) in f64, f32 factorization + f64 iterative refinement.
        # Converges to the f64 optimum (measured), which retired the
        # emulated-f64 fine phase from the nominal trajectory; the hi phase
        # below survives as a stall fallback only.
        mixed_rhs = mixed_precision and pdt == dt and hi != dt
        mp_phase = mixed_precision and (pdt != jnp.float32 or mixed_rhs)
        b_dt = hi if mixed_rhs else pdt

        # Jacobians stay f32 (measured equivalent at convergence; hi jacfwd
        # is the expensive part of an emulated-f64 linearize), only the
        # residual forward pass and the gradient chain are hi
        fwd_dt = pdt if (pdt == dt and not mixed_rhs) else None

        @jax.jit
        def linearize_fn(cams, pts, obs_cam_ch, obs_pt_ch, uv_ch):
            def one_chunk(args):
                oc, op, m = args
                cam_k = jax.tree.map(lambda a: a[oc], cams)
                pt_k = pts[op]
                (A_cam, A_pt), b = factors_mod.linearize(
                    batch, (cam_k, pt_k), forward_dtype=fwd_dt,
                    out_dtype=pdt, measurements=m, b_dtype=b_dt)
                return A_cam, A_pt, b

            Ac, Ap, b = jax.lax.map(one_chunk,
                                    (obs_cam_ch, obs_pt_ch, uv_ch))
            return (Ac.reshape(NCH * CHK, 2, 9)[:Kk],
                    Ap.reshape(NCH * CHK, 2, 3)[:Kk],
                    b.reshape(NCH * CHK, 2)[:Kk])

        # The solve and the retract+error-eval are SEPARATE programs: the
        # solve is pure f32/two-float (compact, fast to load), while retract
        # + forward error run on the f64 state — fusing them (round 4's
        # first cut) dragged the emulated-f64 transcendental code into the
        # big program for no runtime win (the accept loop is host-driven
        # anyway, so the extra dispatch is ~tunnel-latency).
        @partial(jax.jit, static_argnums=(5,))
        def solve_step(A_cam, A_pt, b, lam, sops, diagonal_damping):
            return schur_solve(st, A_cam, A_pt, b, lam, diagonal_damping,
                               mixed_precision=mp_phase, ops=sops)

        @jax.jit
        def apply_step(cams, pts, dc, dl, sops):
            new_cams = jax.vmap(bal_retract)(cams, dc.astype(hi))
            new_pts = pts + dl.astype(hi)
            return new_cams, new_pts, error_fn(
                new_cams, new_pts, sops["obs_cam"], sops["obs_pt"],
                sops["uv"])

        return linearize_fn, solve_step, apply_step

    ops["uv"] = uv

    _ck = (_sig_of(st), Kk, NCH, CHK, str(jnp.dtype(dt)), str(jnp.dtype(hi)),
           bool(mixed_precision))
    _cached = _STEP_FN_CACHE.get(_ck)
    if _cached is None:
        _cached = {"error_fn": error_fn, "phase": {}}
        _STEP_FN_CACHE.clear()   # hold at most one problem's executables
        _STEP_FN_CACHE[_ck] = _cached
    else:
        error_fn = _cached["error_fn"]

    def _phase_cached(pdt):
        key = str(jnp.dtype(pdt))
        if key not in _cached["phase"]:
            _cached["phase"][key] = make_phase(pdt)
        return _cached["phase"][key]

    phases = {dt: _phase_cached(dt)}
    if hi != dt:
        phases[hi] = None   # built lazily on first fine-phase iteration
    pdt = dt
    # fall back to the full-hi fine phase only on a genuine stall: the
    # mixed-rhs working phase converges to the optimum on its own (round 4),
    # so the switch fires only if progress collapses before convergence
    switch_tol = max(10.0 * params.relative_error_tol, 1e-7)

    cams = BalCamera(SE3(jnp.asarray(prob.cam_R, dtype=hi),
                         jnp.asarray(prob.cam_t, dtype=hi)),
                     jnp.asarray(prob.cam_calib, dtype=hi))
    pts = jnp.asarray(prob.points, dtype=hi)

    import os as _os
    import time as _time
    _dbg = _os.environ.get("GTSAM_TPU_BA_DEBUG")

    def _tlog(tag, t0):
        if _dbg:
            print(f"[ba {tag}] {_time.time() - t0:.2f}s", flush=True)

    # Overlap the solve program's load with the cold path: trace/lower/
    # compile (or warm-cache deserialize) and a dummy first execution (which
    # uploads the program to the device) happen on a background thread WHILE
    # the main thread evaluates error0 and the first linearize.  This is
    # wall-clock engineering, not accounting: the stopwatch covers it all.
    import threading as _threading
    linearize_fn, solve_step, apply_step = phases[dt]
    b_warm_dt = hi if (mixed_precision and hi != dt) else dt

    def _warm_solve():
        try:
            # linearize first: the main loop needs it before the solve, and
            # it loads fast — warming it second made the main thread's first
            # linearize wait behind the big solve load (measured +7 s)
            out = linearize_fn(cams, pts, obs_cam_ch, obs_pt_ch, uv_ch)
            jax.block_until_ready(out)
            zA = jnp.zeros((Kk, 2, 9), dtype=dt)
            zP = jnp.zeros((Kk, 2, 3), dtype=dt)
            zb = jnp.zeros((Kk, 2), dtype=b_warm_dt)
            # lam as a python float: the main loop passes python floats, and
            # a jnp scalar would trace a second (dtype-distinct) program
            out = solve_step(zA, zP, zb, float(params.lambda_initial),
                             ops, params.diagonal_damping)
            jax.block_until_ready(out)
        except Exception:   # warm-up is best-effort; real call will surface it
            pass

    _warm_t = _threading.Thread(target=_warm_solve, daemon=True)
    _warm_t.start()

    _t = _time.time()
    error = float(error_fn(cams, pts, ops["obs_cam"], ops["obs_pt"], uv))
    _tlog("error0", _t)
    history = [error]
    iter_times = []
    phase_of_iter = []
    lam = params.lambda_initial
    lam_fail_ceiling = 0.0   # conservative mode: largest lambda seen to fail
    it = 0
    converged = False
    for it in range(1, params.max_iterations + 1):
        _t0 = _time.time()
        if phases[pdt] is None:
            phases[pdt] = _phase_cached(pdt)
        linearize_fn, solve_step, apply_step = phases[pdt]
        _t = _time.time()
        A_cam, A_pt, b = linearize_fn(cams, pts, obs_cam_ch, obs_pt_ch, uv_ch)
        if _dbg:
            jax.block_until_ready(b)
            _tlog(f"it{it} linearize[{jnp.dtype(pdt)}]", _t)
        prev = error
        accepted = False
        lam_entry = lam
        if _dbg == "hlo" and it == 1:
            _co = solve_step.trace(A_cam, A_pt, b, lam, ops,
                                   params.diagonal_damping).lower().compile()
            with open("/tmp/try_step_opt.hlo", "w") as f:
                f.write(_co.as_text())
        while True:
            _t = _time.time()
            dc, dl = solve_step(A_cam, A_pt, b, lam, ops,
                                params.diagonal_damping)
            nc, npts, ne = apply_step(cams, pts, dc, dl, ops)
            ne = float(ne)
            _tlog(f"it{it} try(lam={lam:.1e})", _t)
            if math.isfinite(ne) and ne < error:
                cams, pts, error = nc, npts, ne
                # conservative policy: only probe a smaller lambda when the
                # first try succeeded AND that smaller lambda has never
                # failed (a failed probe costs a full solve — measured
                # 0.9 s/iter on Ladybug).  Default: GTSAM's always-decrease
                # (LevenbergMarquardtOptimizer.cpp:168-215).
                nxt = max(lam / params.lambda_factor,
                          params.lambda_lower_bound)
                if params.lambda_policy != "conservative":
                    lam = nxt
                elif lam == lam_entry and nxt > lam_fail_ceiling:
                    lam = nxt
                accepted = True
                break
            lam_fail_ceiling = max(lam_fail_ceiling, lam)
            lam *= params.lambda_factor
            if lam > params.lambda_upper_bound:
                break
        iter_times.append(_time.time() - _t0)
        phase_of_iter.append(str(jnp.dtype(pdt)))
        if verbose:
            print(f"BA iter {it} [{jnp.dtype(pdt)}]: {prev:.6g} -> {error:.6g} "
                  f"lambda={lam:.3g} ({iter_times[-1]:.2f}s)", flush=True)
        history.append(error)
        if target_error is not None and error <= target_error:
            converged = True
            break
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
