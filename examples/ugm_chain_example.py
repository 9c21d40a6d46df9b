"""UGM_chain analog: a 60-node, 7-state chain MRF decoded with max-product
and queried for exact marginals — the larger UGM tutorial model, which
exercises TableFactor elimination on a long chain.

Reference: examples/UGM_chain.cpp (60 nodes x 7 states, shared transition
potential; MPE + marginals).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gtsam_tpu.discrete.discrete import DiscreteFactorGraph


def main(n_nodes=60, k=7):
    rng = np.random.default_rng(42)
    # UGM chain: node 0 biased to state 0; a banded transition favoring
    # staying or moving up one state
    g = DiscreteFactorGraph()
    unary0 = np.full(k, 0.1)
    unary0[0] = 1.0
    g.add([0], [k], unary0)
    trans = np.full((k, k), 0.1)
    for i in range(k):
        trans[i, i] = 2.0
        if i + 1 < k:
            trans[i, i + 1] = 1.5
    for i in range(n_nodes - 1):
        g.add([i, i + 1], [k, k], trans)
    # weak noisy unaries elsewhere
    for i in range(1, n_nodes):
        g.add([i], [k], 0.5 + 0.1 * rng.random(k))

    mpe = g.optimize()
    path = [mpe[i] for i in range(n_nodes)]
    print("MPE (first 20):", path[:20])
    m_last = np.asarray(g.marginals(n_nodes - 1))
    print(f"P(x{n_nodes-1}) =", np.round(m_last, 3))

    # the chain starts pinned at state 0 and drifts upward along the band
    assert path[0] == 0
    assert all(0 <= s < k for s in path)
    assert path[-1] >= path[0]
    # marginals normalize
    assert abs(m_last.sum() - 1.0) < 1e-6
    return g


if __name__ == "__main__":
    main()
