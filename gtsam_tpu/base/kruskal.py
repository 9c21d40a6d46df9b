"""Kruskal minimum-spanning-tree over factor edges — gtsam/base/kruskal.h
(kruskal-inl.h): order binary factors by weight, union-find accept.  Host-side
(symbolic analysis runs at trace time); used by the subgraph preconditioner
(SubgraphBuilder) and pose-graph initialization.
"""

from typing import Sequence

import numpy as np

from .dsf import DSF


def kruskal(num_vertices: int, edges_ij: np.ndarray,
            weights: Sequence[float]) -> np.ndarray:
    """Return indices of edges forming a minimum-weight spanning forest.

    edges_ij: (E, 2) int vertex pairs; weights: (E,).  Mirrors
    gtsam::utils::kruskal (kruskal-inl.h): sort by weight ascending, accept an
    edge iff it joins two components.
    """
    edges_ij = np.asarray(edges_ij)
    order = np.argsort(np.asarray(weights), kind="stable")
    dsf = DSF(num_vertices)
    accepted = []
    for e in order:
        i, j = int(edges_ij[e, 0]), int(edges_ij[e, 1])
        if dsf.find(i) != dsf.find(j):
            dsf.union(i, j)
            accepted.append(int(e))
            if len(accepted) == num_vertices - 1:
                break
    return np.asarray(sorted(accepted), dtype=np.int64)
