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
