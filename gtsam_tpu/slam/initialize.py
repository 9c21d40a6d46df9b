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
    return Values.from_entries(
        [(k, "SE3", SE3(jnp.asarray(R[idx[k]]), jnp.asarray(t[idx[k]])))
         for k in keys])
