"""Triangulation: batched DLT, LOST, and nonlinear refinement.

Reference: gtsam/geometry/triangulation.h (triangulateDLT:88, triangulateLOST:111,
triangulateNonlinear:191, triangulateSafe:421+TriangulationResult).  Everything
is mask-based (no exceptions) and vmap-ready: a track = (M cameras, M pixel
measurements, M valid flags); invalid/degenerate tracks return valid=False.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3
from .se3 import SE3


class TriangulationResult(NamedTuple):
    point: jnp.ndarray   # (3,)
    valid: jnp.ndarray   # () bool — behind-camera / degenerate / outlier masks


def triangulate_dlt(poses: SE3, measurements_calibrated, mask=None,
                    rank_tol=1e-9) -> TriangulationResult:
    """DLT from calibrated (normalized) image points.

    poses: SE3 with leading dim M (camera-to-world); measurements: (M, 2)
    normalized coords.  Solves sum of cross-product constraints by SVD.
    """
    M = measurements_calibrated.shape[0]
    if mask is None:
        mask = jnp.ones(M, dtype=bool)
    # world->camera projection matrices P = [R^T | -R^T t]
    Rt = jnp.swapaxes(poses.R, -1, -2)
    t = -jnp.einsum("mij,mj->mi", Rt, poses.t)
    P = jnp.concatenate([Rt, t[..., None]], axis=-1)  # (M, 3, 4)
    u = measurements_calibrated[:, 0]
    v = measurements_calibrated[:, 1]
    # rows: u * P[2] - P[0],  v * P[2] - P[1]
    r1 = u[:, None] * P[:, 2] - P[:, 0]
    r2 = v[:, None] * P[:, 2] - P[:, 1]
    A = jnp.concatenate([r1, r2], axis=0)  # (2M, 4)
    w = jnp.concatenate([mask, mask], axis=0).astype(A.dtype)
    A = A * w[:, None]
    _, s, Vt = jnp.linalg.svd(A, full_matrices=True)
    X = Vt[-1]
    ok = (jnp.abs(X[3]) > rank_tol) & (s[-2] > rank_tol) & (mask.sum() >= 2)
    Xs = jnp.where(jnp.abs(X[3]) > rank_tol, X[3], 1.0)
    point = X[:3] / Xs
    return TriangulationResult(point, ok)


def triangulate_lost(poses: SE3, measurements_calibrated, mask=None,
                     measurement_sigma=1e-3) -> TriangulationResult:
    """LOST (linear optimal sine triangulation, Henry&Christian 2022;
    reference triangulation.h:111): DLT weighted by inverse range estimates."""
    init = triangulate_dlt(poses, measurements_calibrated, mask)
    M = measurements_calibrated.shape[0]
    if mask is None:
        mask = jnp.ones(M, dtype=bool)
    # weights ~ 1 / (sigma * range)
    d = jnp.linalg.norm(init.point[None, :] - poses.t, axis=-1)
    w = 1.0 / jnp.maximum(measurement_sigma * d, 1e-12)
    Rt = jnp.swapaxes(poses.R, -1, -2)
    t = -jnp.einsum("mij,mj->mi", Rt, poses.t)
    P = jnp.concatenate([Rt, t[..., None]], axis=-1)
    u = measurements_calibrated[:, 0]
    v = measurements_calibrated[:, 1]
    r1 = (u[:, None] * P[:, 2] - P[:, 0]) * (w * mask)[:, None]
    r2 = (v[:, None] * P[:, 2] - P[:, 1]) * (w * mask)[:, None]
    A = jnp.concatenate([r1, r2], axis=0)
    _, s, Vt = jnp.linalg.svd(A, full_matrices=True)
    X = Vt[-1]
    ok = init.valid & (jnp.abs(X[3]) > 1e-9)
    Xs = jnp.where(jnp.abs(X[3]) > 1e-9, X[3], 1.0)
    return TriangulationResult(X[:3] / Xs, ok)


def triangulate_nonlinear(poses: SE3, measurements_calibrated, point0, mask=None,
                          iterations=5) -> TriangulationResult:
    """Gauss-Newton refinement of reprojection error in normalized coords."""
    M = measurements_calibrated.shape[0]
    if mask is None:
        mask = jnp.ones(M, dtype=bool)

    def residual(p):
        pc = se3.transform_to(poses, p[None].repeat(M, 0))
        z = jnp.where(pc[:, 2] > 1e-6, pc[:, 2], 1.0)
        proj = pc[:, :2] / z[:, None]
        r = (proj - measurements_calibrated) * mask[:, None]
        return r.reshape(-1)

    def body(p, _):
        J = jax.jacfwd(residual)(p)
        r = residual(p)
        H = J.T @ J + 1e-9 * jnp.eye(3)
        p_new = p - jnp.linalg.solve(H, J.T @ r)
        return p_new, None

    p, _ = jax.lax.scan(body, point0, None, length=iterations)
    pc = se3.transform_to(poses, p[None].repeat(M, 0))
    in_front = jnp.all(jnp.where(mask, pc[:, 2] > 0, True))
    return TriangulationResult(p, in_front)


def triangulate_safe(poses: SE3, measurements_calibrated, mask=None,
                     landmark_distance_threshold=1e10,
                     dyn_outlier_rejection_threshold=None) -> TriangulationResult:
    """triangulateSafe analog: DLT + nonlinear refine + cheirality/degeneracy/
    distance/outlier masks (TriangulationParameters semantics)."""
    init = triangulate_dlt(poses, measurements_calibrated, mask)
    res = triangulate_nonlinear(poses, measurements_calibrated, init.point, mask)
    M = measurements_calibrated.shape[0]
    if mask is None:
        mask = jnp.ones(M, dtype=bool)
    dist = jnp.linalg.norm(res.point[None] - poses.t, axis=-1)
    ok = init.valid & res.valid & jnp.all(
        jnp.where(mask, dist < landmark_distance_threshold, True))
    if dyn_outlier_rejection_threshold is not None:
        pc = se3.transform_to(poses, res.point[None].repeat(M, 0))
        z = jnp.where(pc[:, 2] > 1e-6, pc[:, 2], 1.0)
        reproj = jnp.linalg.norm(pc[:, :2] / z[:, None] - measurements_calibrated,
                                 axis=-1)
        ok = ok & jnp.all(jnp.where(mask, reproj < dyn_outlier_rejection_threshold,
                                    True))
    return TriangulationResult(res.point, ok)
