"""Fill-reducing variable orderings (host-side, trace-time).

Reference: gtsam/inference/Ordering.h:41 (COLAMD/METIS/NATURAL/CUSTOM).
The TPU design keeps orderings on host (they gate the static solve schedule).
COLAMD/METIS are vendored C in the reference; here we obtain a minimum-degree
class ordering from SuperLU's MMD_AT_PLUS_A (scipy) on the variable adjacency
pattern, which targets exactly the symmetric fill-minimization this needs.
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np
import scipy.sparse as sp


def adjacency_from_factors(factor_keys: Sequence[np.ndarray], n: int) -> sp.csr_matrix:
    """Variable adjacency (n x n, 0/1) from per-batch (N, arity) key-index arrays."""
    rows, cols = [], []
    for keys in factor_keys:
        keys = np.atleast_2d(keys)
        a = keys.shape[1]
        for i in range(a):
            for j in range(a):
                if i != j:
                    rows.append(keys[:, i])
                    cols.append(keys[:, j])
    if rows:
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        data = np.ones(len(rows), dtype=np.int8)
        A = sp.csr_matrix((data, (rows, cols)), shape=(n, n))
        A.data[:] = 1
    else:
        A = sp.csr_matrix((n, n), dtype=np.int8)
    return A


def minimum_degree(adj: sp.csr_matrix) -> np.ndarray:
    """Fill-reducing permutation: perm[i] = original index eliminated i-th."""
    n = adj.shape[0]
    if n <= 1:
        return np.arange(n)
    A = (adj + adj.T + sp.eye(n, format="csr")).astype(np.float64)
    try:
        from scipy.sparse.linalg import splu
        lu = splu(A.tocsc(), permc_spec="MMD_AT_PLUS_A",
                  options=dict(SymmetricMode=True, DiagPivotThresh=0.0))
        return np.asarray(lu.perm_c)
    except Exception:
        # fallback: reverse Cuthill-McKee
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        return np.asarray(reverse_cuthill_mckee(A.tocsr(), symmetric_mode=True))


def natural(n: int) -> np.ndarray:
    return np.arange(n)


def constrained_last(adj: sp.csr_matrix, last: Sequence[int]) -> np.ndarray:
    """COLAMD-constrained analog (Ordering.h:112): given variables forced last,
    order the rest by minimum degree, then append `last`."""
    n = adj.shape[0]
    last = np.asarray(sorted(set(int(x) for x in last)))
    rest = np.setdiff1d(np.arange(n), last)
    if len(rest):
        sub = adj[rest][:, rest]
        perm_rest = minimum_degree(sub)
        ordered_rest = rest[perm_rest]
    else:
        ordered_rest = rest
    return np.concatenate([ordered_rest, last])
