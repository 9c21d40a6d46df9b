"""Symbolic block-Cholesky analysis (host-side).

The reference's symbolic engine (gtsam/inference: EliminationTree.h:51,
JunctionTree.h:50, BayesTree.h:66) builds pointer trees and eliminates them with
a TBB task pool.  The TPU-native replacement computes, once per graph structure:
  - permuted block-column fill patterns (struct of L)
  - the elimination tree and its height-based LEVEL SCHEDULE
  - flat index arrays (blocks, update triples) grouped by level
which compile into static batched device kernels (linear/sparse.py).  Levels
replace the task tree: two columns at the same etree height are never
ancestor/descendant, so each level is embarrassingly parallel (SURVEY.md §2.8 P2).
"""

import dataclasses
from typing import Dict, List, Tuple

import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class SymbolicFactorization:
    """All indices refer to PERMUTED block columns (elimination order)."""

    n: int
    perm: np.ndarray           # (n,) perm[new] = old
    inv_perm: np.ndarray       # (n,) inv_perm[old] = new
    parent: np.ndarray         # (n,) etree parent (or -1)
    # block-sparse L storage: block b lives at (row[b], col[b]); includes diagonal
    block_row: np.ndarray      # (B,)
    block_col: np.ndarray      # (B,)
    block_of: Dict[Tuple[int, int], int]
    levels: List[np.ndarray]   # level -> columns (sorted)
    col_level: np.ndarray      # (n,) level of each column
    # update triples grouped by target column level: A[i,j] -= L[i,k] @ L[j,k]^T
    # stored as flat arrays of L-block ids: (target_block, via_ik, via_jk)
    triples_by_level: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]
    # per level: its columns' diagonal block ids and subdiagonal block lists
    diag_block_by_col: np.ndarray  # (n,) block id of (j, j)
    nnz_blocks: int


def analyze(adj: sp.csr_matrix, perm: np.ndarray) -> SymbolicFactorization:
    n = adj.shape[0]
    perm = np.asarray(perm)
    inv_perm = np.empty(n, dtype=np.int64)
    inv_perm[perm] = np.arange(n)

    native = _analyze_native(adj, perm, inv_perm)
    if native is not None:
        return native

    # permuted adjacency lists (lower triangle: rows > col)
    A = (adj + adj.T).tocoo()
    nbr: List[set] = [set() for _ in range(n)]
    for i, j in zip(inv_perm[A.row], inv_perm[A.col]):
        if i > j:
            nbr[j].add(int(i))
        elif j > i:
            nbr[i].add(int(j))

    # symbolic elimination: struct[j] = rows below j in L's column j
    struct: List[set] = [set() for _ in range(n)]
    parent = np.full(n, -1, dtype=np.int64)
    for j in range(n):
        s = set(nbr[j])
        # merge children structures (minus the child itself)
        s |= struct[j]
        struct[j] = s
        if s:
            p = min(s)
            parent[j] = p
            struct[p] |= {x for x in s if x != p}

    # levels = height from leaves
    col_level = np.zeros(n, dtype=np.int64)
    for j in range(n):  # children have smaller index than parents? no —
        pass
    # compute heights via topological pass (children always < parent in elim order)
    for j in range(n):
        p = parent[j]
        if p >= 0:
            col_level[p] = max(col_level[p], col_level[j] + 1)
    nlev = int(col_level.max()) + 1 if n else 0
    levels = [np.where(col_level == l)[0] for l in range(nlev)]

    # L block list: diagonal + subdiagonal
    block_row, block_col = [], []
    block_of: Dict[Tuple[int, int], int] = {}

    def add_block(i, j):
        key = (int(i), int(j))
        if key not in block_of:
            block_of[key] = len(block_row)
            block_row.append(int(i))
            block_col.append(int(j))
        return block_of[key]

    for j in range(n):
        add_block(j, j)
        for i in sorted(struct[j]):
            add_block(i, j)

    # update triples: for column k, rows S_k = struct[k]; contributions to
    # (i, j) for i >= j, both in S_k: A[i,j] -= L[i,k] L[j,k]^T.
    # grouped by level of target column j.
    tr_target: List[List[int]] = [[] for _ in range(nlev)]
    tr_ik: List[List[int]] = [[] for _ in range(nlev)]
    tr_jk: List[List[int]] = [[] for _ in range(nlev)]
    for k in range(n):
        S = sorted(struct[k])
        for a, j in enumerate(S):
            lv = int(col_level[j])
            bjk = block_of[(j, k)]
            for i in S[a:]:
                tr_target[lv].append(block_of[(i, j)])
                tr_ik[lv].append(block_of[(i, k)])
                tr_jk[lv].append(bjk)

    triples_by_level = [
        (np.asarray(tr_target[l], dtype=np.int32),
         np.asarray(tr_ik[l], dtype=np.int32),
         np.asarray(tr_jk[l], dtype=np.int32))
        for l in range(nlev)
    ]
    diag_block_by_col = np.asarray([block_of[(j, j)] for j in range(n)],
                                   dtype=np.int32)
    return SymbolicFactorization(
        n=n, perm=perm, inv_perm=inv_perm, parent=parent,
        block_row=np.asarray(block_row, dtype=np.int32),
        block_col=np.asarray(block_col, dtype=np.int32),
        block_of=block_of, levels=levels, col_level=col_level,
        triples_by_level=triples_by_level,
        diag_block_by_col=diag_block_by_col,
        nnz_blocks=len(block_row))


def _analyze_native(adj: sp.csr_matrix, perm: np.ndarray,
                    inv_perm: np.ndarray) -> "SymbolicFactorization":
    """C fast path (gtsam_tpu/native): identical output to the Python path."""
    try:
        from ..native import emit_triples_native, symbolic_analyze_native
    except Exception:
        return None
    n = adj.shape[0]
    A = (adj + adj.T).tocoo()
    pi = inv_perm[A.row]
    pj = inv_perm[A.col]
    lower = pi > pj
    rows_l, cols_l = pi[lower].astype(np.int32), pj[lower].astype(np.int32)
    # CSR by column, sorted rows, deduplicated
    order = np.lexsort((rows_l, cols_l))
    rows_l, cols_l = rows_l[order], cols_l[order]
    if len(rows_l):
        keep = np.concatenate([[True], (np.diff(cols_l.astype(np.int64) * n
                                                + rows_l) != 0)])
        rows_l, cols_l = rows_l[keep], cols_l[keep]
    counts = np.bincount(cols_l, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    out = symbolic_analyze_native(n, indptr, rows_l)
    if out is None:
        return None
    parent, level, struct_indptr, struct_rows = out
    m = np.diff(struct_indptr)
    base = np.concatenate([[0], np.cumsum(1 + m)]).astype(np.int64)
    dblock = base[:-1].astype(np.int32)
    sub_base = (base[:-1] + 1).astype(np.int64)
    nnz = int(base[-1])
    block_row = np.empty(nnz, dtype=np.int32)
    block_col = np.empty(nnz, dtype=np.int32)
    cols = np.arange(n, dtype=np.int32)
    block_row[dblock] = cols
    block_col[dblock] = cols
    sub_mask = np.ones(nnz, dtype=bool)
    sub_mask[dblock] = False
    block_row[sub_mask] = struct_rows
    block_col[sub_mask] = np.repeat(cols, m)
    tt, tik, tjk, tlev = emit_triples_native(
        n, struct_indptr, struct_rows, sub_base, dblock,
        level.astype(np.int32))
    nlev = int(level.max()) + 1 if n else 0
    levels = [np.where(level == l)[0] for l in range(nlev)]
    torder = np.argsort(tlev, kind="stable")
    tt, tik, tjk, tlev = tt[torder], tik[torder], tjk[torder], tlev[torder]
    bounds = np.searchsorted(tlev, np.arange(nlev + 1))
    triples_by_level = [
        (tt[bounds[l]:bounds[l + 1]], tik[bounds[l]:bounds[l + 1]],
         tjk[bounds[l]:bounds[l + 1]]) for l in range(nlev)]
    block_of = {}
    for bid in range(nnz):
        block_of[(int(block_row[bid]), int(block_col[bid]))] = bid
    return SymbolicFactorization(
        n=n, perm=perm, inv_perm=inv_perm,
        parent=parent.astype(np.int64),
        block_row=block_row, block_col=block_col, block_of=block_of,
        levels=levels, col_level=level.astype(np.int64),
        triples_by_level=triples_by_level,
        diag_block_by_col=dblock, nnz_blocks=nnz)
