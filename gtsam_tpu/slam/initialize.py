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
    """Chordal initialization for an SE3 between-factor graph.

    Fully vectorized assembly (round 5): the COO triplets for both the
    rotation and translation systems are built by numpy broadcasting — the
    per-edge python loops were ~60% of the 0.2 s init on sphere2500."""
    edges = _between_se3_edges(graph)
    if not edges:
        raise ValueError("no BetweenSE3 factors in graph")
    keys = sorted({k for e in edges for k in (e[0], e[1])})
    idx = {k: i for i, k in enumerate(keys)}
    n = len(keys)
    if anchor_key is None:
        anchor_key = keys[0]
    a = idx[anchor_key]

    E = len(edges)
    I = np.fromiter((idx[e[0]] for e in edges), dtype=np.int64, count=E)
    J = np.fromiter((idx[e[1]] for e in edges), dtype=np.int64, count=E)
    Rijs = np.stack([e[2] for e in edges])            # (E, 3, 3)
    tijs = np.stack([e[3] for e in edges])            # (E, 3)

    # --- rotations: 3 decoupled systems over 3n unknowns ------------------
    # per edge: rows 3e+r get  +1 at col 3j+r  and  -Rij[c, r] at col 3i+c
    r3 = np.arange(3)
    e3 = 3 * np.arange(E)
    rows_id = (e3[:, None] + r3[None, :]).reshape(-1)
    cols_id = (3 * J[:, None] + r3[None, :]).reshape(-1)
    vals_id = np.ones(3 * E)
    rows_R = (e3[:, None, None] + r3[None, :, None]
              + np.zeros((1, 1, 3), np.int64)).reshape(-1)
    cols_R = (3 * I[:, None, None] + np.zeros((1, 3, 1), np.int64)
              + r3[None, None, :]).reshape(-1)
    vals_R = (-Rijs.transpose(0, 2, 1)).reshape(-1)
    rcount = 3 * E
    # anchor: x_a = e_r (per system), strong weight
    rows = np.concatenate([rows_id, rows_R, rcount + r3])
    cols = np.concatenate([cols_id, cols_R, 3 * a + r3])
    vals = np.concatenate([vals_id, vals_R, np.full(3, 10.0)])
    A = sp.csr_matrix((vals, (rows, cols)), shape=(rcount + 3, 3 * n))
    AtA = (A.T @ A).tocsc()
    lu = spla.splu(AtA)
    B = np.zeros((rcount + 3, 3))
    B[rcount + r3, r3] = 10.0          # anchor rows = 10 * e_r
    X3 = lu.solve(A.T @ B)             # (3n, 3): all 3 systems at once
    X = X3.reshape(n, 3, 3).transpose(0, 2, 1)   # row r of each rotation
    # project to SO(3)
    U, _s, Vt = np.linalg.svd(X)
    det = np.linalg.det(U @ Vt)
    D = np.zeros((n, 3, 3))
    D[:, 0, 0] = 1.0
    D[:, 1, 1] = 1.0
    D[:, 2, 2] = det
    R = U @ D @ Vt

    # --- translations: t_j - t_i = R_i t_ij -------------------------------
    rhs = np.einsum("eij,ej->ei", R[I], tijs)         # (E, 3)
    rows_t = np.concatenate([rows_id, rows_id, rcount + r3])
    cols_t = np.concatenate([cols_id,
                             (3 * I[:, None] + r3[None, :]).reshape(-1),
                             3 * a + r3])
    vals_t = np.concatenate([np.ones(3 * E), -np.ones(3 * E),
                             np.full(3, 10.0)])
    A = sp.csr_matrix((vals_t, (rows_t, cols_t)), shape=(rcount + 3, 3 * n))
    bv = np.concatenate([rhs.reshape(-1), np.zeros(3)])
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
