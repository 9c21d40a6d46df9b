"""Fill-reducing variable orderings (host-side, trace-time).

Reference: gtsam/inference/Ordering.h:41 (COLAMD/METIS/NATURAL/CUSTOM).
The TPU design keeps orderings on host (they gate the static solve schedule).
COLAMD/METIS are vendored C in the reference; here we obtain a minimum-degree
class ordering from SuperLU's MMD_AT_PLUS_A (scipy) on the variable adjacency
pattern, which targets exactly the symmetric fill-minimization this needs.
"""

from typing import Sequence

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


def minimum_degree(adj: sp.csr_matrix,
                   constrained_last=None) -> np.ndarray:
    """Fill-reducing permutation: perm[i] = original index eliminated i-th.

    Uses the native C AMD (approximate minimum degree on the quotient graph
    with mass elimination and element absorption — the CCOLAMD-class heuristic
    the reference vendors, gtsam/inference/Ordering.cpp:23) when available;
    falls back to SuperLU's MMD, then RCM.  `constrained_last` (bool mask)
    forces those variables to the end (ColamdConstrainedLast analog,
    Ordering.h:112)."""
    n = adj.shape[0]
    if n <= 1:
        return np.arange(n)
    As = ((adj + adj.T) > 0).astype(np.int8).tocsr()
    try:
        from ..native import amd_order_native
        perm = amd_order_native(n, As.indptr, As.indices, constrained_last)
        if perm is not None:
            return perm
    except Exception:
        pass
    A = (As + sp.eye(n, format="csr")).astype(np.float64)
    if constrained_last is not None:
        last = np.where(np.asarray(constrained_last))[0]
        rest = np.setdiff1d(np.arange(n), last)
        sub = A[rest][:, rest]
        return np.concatenate([rest[minimum_degree(sub)], last])
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


def nested_dissection(adj: sp.csr_matrix, leaf_size: int = 32,
                      method: str = "auto") -> np.ndarray:
    """METIS-class nested dissection.

    Native path (gtsam_tpu/native/src/nd.c): multilevel vertex bisection —
    heavy-edge-matching coarsening, BFS initial bisection, boundary-FM
    refinement per level, vertex separators, AMD leaves.  Python fallback:
    single-level BFS bisection.  Reference analog: Ordering::Metis
    (Ordering.h:201), MetisIndex.h:37.  Produces balanced elimination trees
    (shallow level schedules + small separators), which is what the
    level-scheduled device factorization needs.
    """
    n_ = adj.shape[0]
    if n_ > 2 and method != "bfs":
        try:
            from ..native import nd_order_native
            As_ = ((adj + adj.T) > 0).astype(np.int8).tocsr()
            perm = nd_order_native(n_, As_.indptr, As_.indices, leaf_size)
            if perm is not None:
                return perm
        except Exception:
            pass
        if method == "native":
            pass   # fall through to the Python implementation as backup
    from scipy.sparse.csgraph import breadth_first_order, connected_components

    A = ((adj + adj.T) > 0).astype(np.int8).tocsr()
    n = A.shape[0]
    order: list = []

    def local_order(nodes):
        if len(nodes) <= 1:
            order.extend(nodes.tolist())
            return
        sub = A[nodes][:, nodes]
        p = minimum_degree(sub)
        order.extend(nodes[p].tolist())

    def bfs_levels(sub, start):
        nodes_order, preds = breadth_first_order(sub, start, directed=False,
                                                 return_predecessors=True)
        lev = np.full(sub.shape[0], -1, dtype=np.int64)
        lev[start] = 0
        for v in nodes_order[1:]:
            lev[v] = lev[preds[v]] + 1
        return lev

    def rec(nodes):
        if len(nodes) <= leaf_size:
            local_order(nodes)
            return
        sub = A[nodes][:, nodes].tocsr()
        ncomp, labels = connected_components(sub, directed=False)
        if ncomp > 1:
            for c in range(ncomp):
                rec(nodes[labels == c])
            return
        # pseudo-peripheral start
        lev0 = bfs_levels(sub, 0)
        f1 = int(np.argmax(lev0))
        lev = bfs_levels(sub, f1)
        med = np.median(lev)
        in_a = lev <= med
        if in_a.all() or not in_a.any():
            local_order(nodes)
            return
        # separator: vertices of A adjacent to B
        indptr, indices = sub.indptr, sub.indices
        sep_mask = np.zeros(len(nodes), dtype=bool)
        a_idx = np.where(in_a)[0]
        for v in a_idx:
            nbrs = indices[indptr[v]:indptr[v + 1]]
            if np.any(~in_a[nbrs]):
                sep_mask[v] = True
        part_a = np.where(in_a & ~sep_mask)[0]
        part_b = np.where(~in_a)[0]
        sep = np.where(sep_mask)[0]
        if len(part_a) == 0 or len(part_b) == 0:
            local_order(nodes)
            return
        rec(nodes[part_a])
        rec(nodes[part_b])
        order.extend(nodes[sep].tolist())  # separator eliminated last

    rec(np.arange(n))
    return np.asarray(order, dtype=np.int64)


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
