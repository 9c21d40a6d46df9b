"""Smart projection factors: structureless bundle adjustment.

Reference: gtsam/slam/SmartProjectionFactor.h:44 / SmartProjectionPoseFactor.h —
the landmark is triangulated from the current cameras (cached triangulateSafe)
and eliminated analytically; the resulting camera-only factor is the
Q-projected Jacobian factor (JacobianFactorQ.h):
    A = Q F,  b = -Q r,  Q = I - E (E^T E)^-1 E^T
where F/E are the reprojection Jacobians wrt cameras/point
(CameraSet::SchurComplement, CameraSet.h:174).  Degenerate triangulations zero
the whole factor (SmartFactorParams degeneracyMode = ZERO_ON_DEGENERACY).

TPU design: one batch = all tracks, padded to M cameras/track with masks;
triangulation, Jacobians (autodiff), and the Q projection are vmapped per track.
"""

import jax
import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np

from ..base import noise as noise_mod
from ..geometry import se3, triangulation as tri
from ..geometry.cameras import calibrate_cal3s2, uncalibrate_cal3s2
from ..geometry.se3 import SE3
from ..graph import factors as factors_mod


def smart_projection_factors(pose_keys: np.ndarray, measurements: np.ndarray,
                             mask: np.ndarray, K,
                             pixel_sigma: float = 1.0,
                             body_P_sensor: SE3 = None,
                             mode: str = "JACOBIAN_Q",
                             cam_ids: np.ndarray = None) -> factors_mod.FactorBatch:
    """Build a smart-factor batch.

    pose_keys: (T, M) int64 — camera-pose key per observation (padded rows
      repeat a valid key with mask=0).
    measurements: (T, M, 2) pixels;  mask: (T, M) valid flags.
    K: (5,) Cal3_S2 [fx, fy, s, u0, v0] shared calibration
      (SmartProjectionPoseFactor: fixed K), or (C, 5) per-camera calibrations
      indexed by cam_ids (SmartProjectionRigFactor: per-camera K).
    body_P_sensor: extrinsic SE3 (single, or a batch of C rig extrinsics
      indexed by cam_ids — SmartProjectionRigFactor.h's fixed rig).
    mode: linearization mode (SmartFactorParams.h LinearizationMode):
      - "JACOBIAN_Q" (default): A = Q F where Q = I - E(E'E)^-1 E'
        (JacobianFactorQ.h).
      - "JACOBIAN_SVD": A = U2 U2' F where U2 = null-space basis of E from a
        complete QR (JacobianFactorSVD.h); information-identical to Q
        (U2 U2' == Q) but built from an orthogonal basis — rank-revealing and
        better conditioned for near-degenerate tracks.
      - "HESSIAN": see smart_hessian_blocks() — explicit per-track
        (G, g) camera-Hessian blocks (CameraSet::SchurComplement ->
        RegularHessianFactor path).
      - "IMPLICIT_SCHUR": there is no separate factor type here by design —
        PCGSolver's matvec on a JACOBIAN_Q batch computes F'Q(QF v) as two
        batched einsums and never forms the Hessian, which IS the
        RegularImplicitSchurFactor.h:272 multiplyHessianAdd semantics; use
        mode="JACOBIAN_Q" with PCGSolver/SubgraphPCGSolver.
    cam_ids: (T, M) int32 camera index per slot, for per-camera K / rig mode.
    """
    if mode == "IMPLICIT_SCHUR":
        mode = "JACOBIAN_Q"   # same factor; pair with PCG (see docstring)
    if mode not in ("JACOBIAN_Q", "JACOBIAN_SVD"):
        raise ValueError(f"unknown smart linearization mode {mode!r}; "
                         "HESSIAN mode is built by smart_hessian_blocks()")
    T, M = pose_keys.shape
    K = jnp.asarray(K, dtype=_default_dtype())
    per_camera = (K.ndim == 2)
    if per_camera and cam_ids is None:
        raise ValueError("per-camera K (C, 5) requires cam_ids (T, M)")
    rig = body_P_sensor is not None and body_P_sensor.R.ndim == 3
    if rig and cam_ids is None:
        raise ValueError("rig body_P_sensor requires cam_ids (T, M)")
    if cam_ids is not None:
        meas = (jnp.asarray(measurements, dtype=_default_dtype()),
                jnp.asarray(mask, dtype=bool),
                jnp.asarray(cam_ids, dtype=jnp.int32))
    else:
        meas = (jnp.asarray(measurements, dtype=_default_dtype()),
                jnp.asarray(mask, dtype=bool))
    inv_sigma = 1.0 / pixel_sigma

    def _slot_K(meas_one):
        if per_camera:
            return K[meas_one[2]]          # (M, 5)
        return K

    def _poses_from_xs(xs, meas_one):
        R = jnp.stack([x.R for x in xs])
        t = jnp.stack([x.t for x in xs])
        if body_P_sensor is not None:
            ext = body_P_sensor
            if rig:
                ids = meas_one[2]
                ext = SE3(body_P_sensor.R[ids], body_P_sensor.t[ids])
            return se3.compose(SE3(R, t), ext)
        return SE3(R, t)

    def _triangulate(poses, uv, m, Kslot):
        pn = calibrate_cal3s2(Kslot, uv)  # normalized coords
        res = tri.triangulate_safe(poses, pn, m)
        return res

    def _reproj_residual(poses, point, uv, m, Kslot):
        pc = se3.transform_to(poses, point[None].repeat(M, 0))
        z = pc[..., 2]
        ok = (z > 1e-8) & m
        zs = jnp.where(ok, z, 1.0)
        pn = pc[..., :2] / zs[..., None]
        pix = uncalibrate_cal3s2(Kslot, pn)
        r = jnp.where(ok[..., None], pix - uv, 0.0)
        return r, ok

    def residual_one(xs, meas_one):
        uv, m = meas_one[0], meas_one[1]
        Kslot = _slot_K(meas_one)
        poses = _poses_from_xs(xs, meas_one)
        t3 = _triangulate(poses, uv, m, Kslot)
        r, ok = _reproj_residual(poses, t3.point, uv, m, Kslot)
        r = jnp.where(t3.valid, r * inv_sigma, 0.0)
        return r.reshape(-1)

    def linearize_one(xs, meas_one):
        uv, m = meas_one[0], meas_one[1]
        Kslot = _slot_K(meas_one)
        poses = _poses_from_xs(xs, meas_one)
        t3 = _triangulate(poses, uv, m, Kslot)
        point = jax.lax.stop_gradient(t3.point)

        # F blocks: dr_m/dpose_m (2, 6) via tangent perturbation; E: dr/dpoint
        def r_of_perturbed(deltas, p):
            xs_p = tuple(se3.retract(x, d) for x, d in zip(xs, deltas))
            ps = _poses_from_xs(xs_p, meas_one)
            r, _ = _reproj_residual(ps, p, uv, m, Kslot)
            return r.reshape(-1)  # (2M,)

        zeros = tuple(jnp.zeros(6, dtype=uv.dtype) for _ in range(M))
        F = jax.jacfwd(r_of_perturbed, argnums=0)(zeros, point)  # tuple of (2M, 6)
        E = jax.jacfwd(lambda p: r_of_perturbed(zeros, p))(point)  # (2M, 3)
        r, _ok = _reproj_residual(poses, point, uv, m, Kslot)
        r = r.reshape(-1)

        # whiten
        F = tuple(f * inv_sigma for f in F)
        E = E * inv_sigma
        r = r * inv_sigma

        if mode == "JACOBIAN_SVD":
            # orthogonal null-space basis of E via complete QR
            # (JacobianFactorSVD.h's "Nullspace trick").  U2 U2' == Q holds
            # only when E has full column rank 3; rank-deficient (degenerate)
            # tracks would lose a nullspace direction here, but those are
            # already zeroed below via the triangulation `valid` mask, so the
            # rank-3 assumption is safe on the surviving factors.
            Qfull, _ = jnp.linalg.qr(E, mode="complete")   # (2M, 2M)
            U2 = Qfull[:, 3:]                              # (2M, 2M-3)

            def q_apply(v):
                return U2 @ (U2.T @ v)
        else:
            # Q = I - E (E^T E + eps)^-1 E^T (projector onto point nullspace)
            EtE = E.T @ E + 1e-10 * jnp.eye(3, dtype=E.dtype)
            P = jnp.linalg.inv(EtE)
            QE = E @ P

            def q_apply(v):
                return v - QE @ (E.T @ v)

        A = tuple(q_apply(f) for f in F)
        b = -q_apply(r)
        # degenerate: zero the factor entirely
        valid = t3.valid
        A = tuple(jnp.where(valid, a, 0.0) for a in A)
        b = jnp.where(valid, b, 0.0)
        return A, b

    return factors_mod.FactorBatch(
        name="SmartProjectionPose",
        var_types=("SE3",) * M,
        keys=np.asarray(pose_keys, dtype=np.int64),
        rdim=2 * M,
        residual_fn=residual_one,
        measurements=meas,
        noise=noise_mod.unit(),
        linearize_fn=linearize_one,
    )


def smart_hessian_blocks(batch: factors_mod.FactorBatch, values):
    """HESSIAN linearization mode: explicit per-track camera-Hessian blocks.

    Reference: SmartProjectionFactor.h:198 createHessianFactor ->
    CameraSet::SchurComplement (CameraSet.h:174): G = F'QF, g = F'Q(-r) where
    Q projects out the triangulated point.  Returns (G (T, M, M, 6, 6),
    g (T, M, 6), keys (T, M)) — the RegularHessianFactor payload, consumable
    by accumulate_hessian() or any scatter-assembly.

    Built from the batch's own Q-projected rows (A = QF, b = -Qr), so it is
    information-identical to the JACOBIAN_Q factor by construction:
    G_ij = A_i' A_j, g_i = A_i' b.
    """
    import jax as _jax
    rows = values.rows_of("SE3", batch.keys.reshape(-1))
    T, M = batch.keys.shape
    R = values.arrays["SE3"].R[rows].reshape(T, M, 3, 3)
    t = values.arrays["SE3"].t[rows].reshape(T, M, 3)

    def one(Rk, tk, meas_one):
        xs = tuple(SE3(Rk[i], tk[i]) for i in range(M))
        A, b = batch.linearize_fn(xs, meas_one)
        Astk = jnp.stack(A, axis=0)          # (M, 2M, 6)
        G = jnp.einsum("ard,bre->abde", Astk, Astk)   # (M, M, 6, 6)
        g = jnp.einsum("ard,r->ad", Astk, b)          # (M, 6)
        return G, g

    meas = batch.measurements
    return (*_jax.vmap(one)(R, t, meas), batch.keys)


def accumulate_hessian(H, g_vec, G, g, keys, values):
    """Scatter per-track HESSIAN-mode blocks into a dense (D, D) system.

    H, g_vec: dense system arrays (layout = values.layout()); G, g, keys from
    smart_hessian_blocks().  Returns updated (H, g_vec).
    """
    T, M = keys.shape
    lay = values.layout()
    rows = values.rows_of("SE3", keys.reshape(-1))
    offs = np.asarray(lay.offsets["SE3"])[rows].reshape(T, M)
    oi = jnp.asarray(offs[:, :, None, None, None]
                     + np.zeros((1, 1, M, 6, 6), np.int32)
                     + np.arange(6)[None, None, None, :, None])
    oj = jnp.asarray(offs[:, None, :, None, None]
                     + np.zeros((1, M, 1, 6, 6), np.int32)
                     + np.arange(6)[None, None, None, None, :])
    H = H.at[oi, oj].add(G)
    gi = jnp.asarray(offs[:, :, None] + np.arange(6)[None, None, :])
    g_vec = g_vec.at[gi].add(g)
    return H, g_vec


def triangulate_tracks(pose_keys, measurements, mask, K, values):
    """Convenience: current triangulations of all tracks (for inspection)."""
    T, M = pose_keys.shape
    rows = values.rows_of("SE3", pose_keys.reshape(-1))
    R = values.arrays["SE3"].R[rows].reshape(T, M, 3, 3)
    t = values.arrays["SE3"].t[rows].reshape(T, M, 3)
    K = jnp.asarray(K)

    def one(Rk, tk, uv, m):
        pn = calibrate_cal3s2(K, uv)
        return tri.triangulate_safe(SE3(Rk, tk), pn, m)

    return jax.vmap(one)(R, t, jnp.asarray(measurements), jnp.asarray(mask))


def smart_stereo_factors(pose_keys: np.ndarray, measurements: np.ndarray,
                         mask: np.ndarray, K, baseline: float,
                         pixel_sigma: float = 1.0,
                         body_P_sensor: SE3 = None) -> factors_mod.FactorBatch:
    """Structureless stereo BA batch.

    Reference: gtsam_unstable/slam/SmartStereoProjectionPoseFactor.h — same
    triangulate-then-project-out-the-point scheme as the mono smart factor,
    with StereoCamera measurements (uL, uR, v) and a 3-row residual per view.
    Triangulation uses the left pinhole cameras (as the reference does).

    measurements: (T, M, 3); mask: (T, M); K: (5,) Cal3_S2 of the left camera.
    """
    from ..geometry.cameras import stereo_project
    T, M = pose_keys.shape
    K = jnp.asarray(K, dtype=_default_dtype())
    meas = (jnp.asarray(measurements, dtype=_default_dtype()),
            jnp.asarray(mask, dtype=bool))
    inv_sigma = 1.0 / pixel_sigma

    def _poses_from_xs(xs):
        R = jnp.stack([x.R for x in xs])
        t = jnp.stack([x.t for x in xs])
        if body_P_sensor is not None:
            return se3.compose(SE3(R, t), body_P_sensor)
        return SE3(R, t)

    def _triangulate(poses, uvw, m):
        left = jnp.stack([uvw[..., 0], uvw[..., 2]], axis=-1)  # (uL, v)
        pn = calibrate_cal3s2(K, left)
        return tri.triangulate_safe(poses, pn, m)

    def _residual(poses, point, uvw, m):
        pred, ok = stereo_project(poses, K, baseline,
                                  point[None].repeat(M, 0))
        ok = ok & m
        r = jnp.where(ok[..., None], pred - uvw, 0.0)
        return r, ok

    def residual_one(xs, meas_one):
        uvw, m = meas_one
        poses = _poses_from_xs(xs)
        t3 = _triangulate(poses, uvw, m)
        r, _ = _residual(poses, t3.point, uvw, m)
        return jnp.where(t3.valid, r * inv_sigma, 0.0).reshape(-1)

    def linearize_one(xs, meas_one):
        uvw, m = meas_one
        poses = _poses_from_xs(xs)
        t3 = _triangulate(poses, uvw, m)
        point = jax.lax.stop_gradient(t3.point)

        def r_of(deltas, p):
            xs_p = tuple(se3.retract(x, d) for x, d in zip(xs, deltas))
            r, _ = _residual(_poses_from_xs(xs_p), p, uvw, m)
            return r.reshape(-1)

        zeros = tuple(jnp.zeros(6, dtype=uvw.dtype) for _ in range(M))
        F = jax.jacfwd(r_of, argnums=0)(zeros, point)
        E = jax.jacfwd(lambda p: r_of(zeros, p))(point)
        r = r_of(zeros, point)
        F = tuple(f * inv_sigma for f in F)
        E = E * inv_sigma
        r = r * inv_sigma
        EtE = E.T @ E + 1e-10 * jnp.eye(3, dtype=E.dtype)
        QE = E @ jnp.linalg.inv(EtE)

        def q_apply(v):
            return v - QE @ (E.T @ v)

        A = tuple(jnp.where(t3.valid, q_apply(f), 0.0) for f in F)
        b = jnp.where(t3.valid, -q_apply(r), 0.0)
        return A, b

    return factors_mod.FactorBatch(
        name="SmartStereoPose",
        var_types=("SE3",) * M,
        keys=np.asarray(pose_keys, dtype=np.int64),
        rdim=3 * M,
        residual_fn=residual_one,
        measurements=meas,
        noise=noise_mod.unit(),
        linearize_fn=linearize_one,
    )
