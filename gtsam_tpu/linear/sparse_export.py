"""Sparse-matrix export of the linearized system (SciPy CSR/COO).

Reference analog: gtsam/linear/SparseEigen.h (sparseJacobianEigen — convert a
GaussianFactorGraph to an Eigen::SparseMatrix for external consumers) and
GaussianFactorGraph::sparseJacobian_().  Here the export runs host-side on the
whitened per-batch blocks; it is a tooling/interop surface, not a compute path
(the solvers consume the batched blocks directly on device).
"""

import numpy as np


def sparse_jacobian(bound, arrays):
    """Whitened sparse Jacobian of the bound graph at `arrays`.

    Returns (A, b): A is a scipy.sparse CSR matrix of shape (total_rows, D)
    stacking every factor's whitened Jacobian rows in batch order; b is the
    (total_rows,) stacked whitened RHS (convention ||A dx - b||^2).
    """
    import scipy.sparse as sp

    lin = bound.linearize(arrays)
    D = bound.layout.total_dim
    rows_l, cols_l, vals_l, b_l = [], [], [], []
    row0 = 0
    for (wJ, bvec), bt, st in zip(lin, bound.graph.batches, bound.structures):
        n, rdim = bvec.shape
        dims = bt.dims()
        if bt.sign < 0:
            # Negative information (anti-factors) cannot be represented as
            # real Jacobian rows: A^T A would flip the sign back to +J'J.
            raise NotImplementedError(
                "sparse_jacobian cannot represent anti-factor batches "
                f"(batch {bt.name!r} has sign {bt.sign}); negative "
                "information has no real square root")
        sgn = np.sqrt(abs(bt.sign)) * np.sign(bt.sign)
        frows = row0 + np.arange(n * rdim).reshape(n, rdim)
        for i in range(bt.arity):
            Ji = np.asarray(wJ[i]) * sgn             # (n, rdim, d_i)
            cidx = (np.asarray(st.col_offsets[i])[:, None, None]
                    + np.arange(dims[i])[None, None, :])  # (n, 1, d_i)
            ridx = np.broadcast_to(frows[:, :, None], Ji.shape)
            cidx = np.broadcast_to(cidx, Ji.shape)
            rows_l.append(ridx.reshape(-1))
            cols_l.append(cidx.reshape(-1))
            vals_l.append(Ji.reshape(-1))
        b_l.append(np.asarray(bvec).reshape(-1) * sgn)
        row0 += n * rdim
    A = sp.coo_matrix(
        (np.concatenate(vals_l), (np.concatenate(rows_l),
                                  np.concatenate(cols_l))),
        shape=(row0, D)).tocsr()
    return A, np.concatenate(b_l)


def sparse_hessian(bound, arrays):
    """Sparse normal-equations matrix H = A^T A and gradient g = A^T b
    (reference GaussianFactorGraph::hessian, sparse form)."""
    A, b = sparse_jacobian(bound, arrays)
    return (A.T @ A).tocsr(), A.T @ b
