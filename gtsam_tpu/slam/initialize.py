"""Pose-graph initialization: 3D chordal relaxation (and 2D orientation init).

Reference: gtsam/slam/InitializePose3.{h,cpp} (computeOrientationsChordal:45,
initialize:87) and lago for 2D.  This is one-time host-side preprocessing (like
orderings): small sparse linear solves via scipy; the heavy nonlinear refinement
then runs on device.

Rotation relaxation: for each between factor (i, j, Rij), Rj ≈ Ri @ Rij.
Writing rows x = R[r, :] as unknown row-vectors, x_j = x_i @ Rij, i.e.
x_j^T = Rij^T x_i^T — three decoupled sparse least-squares systems sharing one
matrix.  Solutions are projected back to SO(3) by SVD.  Translations then solve
t_j - t_i = R_i t_ij linearly with the anchor fixed.
"""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from ..geometry.se3 import SE3
from ..graph.graph import FactorGraph
from ..graph.values import Values


def _between_se3_edges(graph: FactorGraph):
    """Collect (i, j, Rij, tij) from all BetweenSE3 batches."""
    out = []
    for b in graph.batches:
        if b.var_types == ("SE3", "SE3") and b.name.startswith("Between"):
            R = np.asarray(b.measurements.R)
            t = np.asarray(b.measurements.t)
            for n in range(b.num_factors):
                out.append((int(b.keys[n, 0]), int(b.keys[n, 1]), R[n], t[n]))
    return out


def initialize_pose3_chordal(graph: FactorGraph, anchor_key=None) -> Values:
    """Chordal initialization for an SE3 between-factor graph."""
    edges = _between_se3_edges(graph)
    if not edges:
        raise ValueError("no BetweenSE3 factors in graph")
    keys = sorted({k for e in edges for k in (e[0], e[1])})
    idx = {k: i for i, k in enumerate(keys)}
    n = len(keys)
    if anchor_key is None:
        anchor_key = keys[0]
    a = idx[anchor_key]

    # --- rotations: 3 decoupled systems over 3n unknowns ------------------
    rows, cols, vals = [], [], []
    rcount = 0
    for (i, j, Rij, _t) in edges:
        ii, jj = idx[i], idx[j]
        # x_j^T - Rij^T x_i^T = 0  (3 equations per edge per row-system)
        for r in range(3):
            rows.append(rcount + r)
            cols.append(3 * jj + r)
            vals.append(1.0)
            for c in range(3):
                rows.append(rcount + r)
                cols.append(3 * ii + c)
                vals.append(-Rij[c, r])  # Rij^T[r, c] = Rij[c, r]
        rcount += 3
    # anchor: x_a = e_r (per system)
    A_rows = []
    b_all = np.zeros((rcount + 3, 3))
    for r in range(3):
        rows.append(rcount + r)
        cols.append(3 * a + r)
        vals.append(10.0)  # strong anchor weight
    A = sp.csr_matrix((vals, (rows, cols)), shape=(rcount + 3, 3 * n))
    AtA = (A.T @ A).tocsc()
    lu = spla.splu(AtA)
    X = np.zeros((n, 3, 3))
    for r in range(3):  # solve for row r of every rotation
        b = np.zeros(rcount + 3)
        b[rcount + r] = 10.0  # anchor row = e_r
        x = lu.solve(A.T @ b)
        X[:, r, :] = x.reshape(n, 3)
    # project to SO(3)
    U, _s, Vt = np.linalg.svd(X)
    det = np.linalg.det(U @ Vt)
    D = np.zeros((n, 3, 3))
    D[:, 0, 0] = 1.0
    D[:, 1, 1] = 1.0
    D[:, 2, 2] = det
    R = U @ D @ Vt

    # --- translations: t_j - t_i = R_i t_ij -------------------------------
    rows, cols, vals = [], [], []
    b = []
    rcount = 0
    for (i, j, _Rij, tij) in edges:
        ii, jj = idx[i], idx[j]
        rhs = R[ii] @ tij
        for r in range(3):
            rows.append(rcount + r); cols.append(3 * jj + r); vals.append(1.0)
            rows.append(rcount + r); cols.append(3 * ii + r); vals.append(-1.0)
            b.append(rhs[r])
        rcount += 3
    for r in range(3):
        rows.append(rcount + r); cols.append(3 * a + r); vals.append(10.0)
        b.append(0.0)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(rcount + 3, 3 * n))
    bv = np.asarray(b)
    t = spla.splu((A.T @ A).tocsc()).solve(A.T @ bv).reshape(n, 3)

    import jax.numpy as jnp
    # bulk construction: ONE device transfer, not one per key (keys are
    # sorted, so R/t rows are already in key order)
    return Values({"SE3": SE3(jnp.asarray(R), jnp.asarray(t))},
                  {"SE3": np.asarray(keys)})


def initialize_pose2_lago(graph: FactorGraph, anchor_key=None) -> Values:
    """LAGO 2D initialization (gtsam/slam/lago.{h,cpp}): orientations first from
    a linear system with 2-pi corrections off a spanning tree, then positions
    linearly."""
    edges = []
    for b in graph.batches:
        if b.var_types == ("SE2", "SE2") and b.name.startswith("Between"):
            m = np.asarray(b.measurements)
            for n in range(b.num_factors):
                edges.append((int(b.keys[n, 0]), int(b.keys[n, 1]),
                              m[n, 0], m[n, 1], m[n, 2]))
    if not edges:
        raise ValueError("no BetweenSE2 factors")
    keys = sorted({k for e in edges for k in (e[0], e[1])})
    idx = {k: i for i, k in enumerate(keys)}
    n = len(keys)
    a = idx[anchor_key] if anchor_key is not None else 0

    # spanning tree (BFS) -> initial theta guesses
    adj = {}
    for ei, (i, j, dx, dy, dth) in enumerate(edges):
        adj.setdefault(idx[i], []).append((idx[j], dth, ei))
        adj.setdefault(idx[j], []).append((idx[i], -dth, ei))
    theta0 = np.full(n, np.nan)
    theta0[a] = 0.0
    stack = [a]
    while stack:
        u = stack.pop()
        for (v, dth, _e) in adj.get(u, []):
            if np.isnan(theta0[v]):
                theta0[v] = theta0[u] + dth
                stack.append(v)
    theta0 = np.nan_to_num(theta0)

    # linear orientation solve with integer 2pi corrections from theta0
    rows, cols, vals, rhs = [], [], [], []
    rc = 0
    for (i, j, _dx, _dy, dth) in edges:
        ii, jj = idx[i], idx[j]
        k2pi = np.round((theta0[jj] - theta0[ii] - dth) / (2 * np.pi))
        rows += [rc, rc]
        cols += [jj, ii]
        vals += [1.0, -1.0]
        rhs.append(dth + 2 * np.pi * k2pi)
        rc += 1
    rows.append(rc); cols.append(a); vals.append(10.0); rhs.append(0.0)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(rc + 1, n))
    theta = spla.splu((A.T @ A).tocsc()).solve(A.T @ np.asarray(rhs))

    # linear position solve with fixed orientations
    rows, cols, vals, rhs = [], [], [], []
    rc = 0
    for (i, j, dx, dy, _dth) in edges:
        ii, jj = idx[i], idx[j]
        c, s = np.cos(theta[ii]), np.sin(theta[ii])
        wx, wy = c * dx - s * dy, s * dx + c * dy
        for r, w in ((0, wx), (1, wy)):
            rows += [rc, rc]
            cols += [2 * jj + r, 2 * ii + r]
            vals += [1.0, -1.0]
            rhs.append(w)
            rc += 1
    for r in range(2):
        rows.append(rc + r); cols.append(2 * a + r); vals.append(10.0)
        rhs.append(0.0)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(rc + 2, 2 * n))
    xy = spla.splu((A.T @ A).tocsc()).solve(A.T @ np.asarray(rhs)).reshape(n, 2)

    import jax.numpy as jnp
    pose = np.concatenate([xy, theta[:, None]], axis=1)  # key order == idx order
    return Values({"SE2": jnp.asarray(pose)}, {"SE2": np.asarray(keys)})
