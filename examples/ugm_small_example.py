"""UGM_small analog: a 4-node binary Markov random field (undirected
graphical model) with node and edge potentials, queried for the MPE and
exact marginals by elimination.

Reference: examples/UGM_small.cpp (the UGM tutorial MRF: nodes with biased
unary potentials, attractive pairwise potentials, decoding + marginals).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gtsam_tpu.discrete.discrete import DiscreteFactorGraph


def main():
    g = DiscreteFactorGraph()
    # unary potentials (UGM_small node potentials)
    g.add([0], [2], np.array([1.0, 3.0]))
    g.add([1], [2], np.array([9.0, 1.0]))
    g.add([2], [2], np.array([1.0, 3.0]))
    g.add([3], [2], np.array([9.0, 1.0]))
    # attractive pairwise potentials on the chain 0-1-2-3
    edge = np.array([[2.0, 1.0], [1.0, 2.0]])
    for i in range(3):
        g.add([i, i + 1], [2, 2], edge)

    mpe = g.optimize()
    print("MPE decoding:", [mpe[i] for i in range(4)])

    for i in range(4):
        m = np.asarray(g.marginals(i))
        print(f"P(x{i}) = {np.round(m, 4)}")

    # node 1's strong bias to state 0 should win in the MPE
    assert mpe[1] == 0 and mpe[3] == 0
    # and drag its chain neighbours' marginals toward 0 relative to their
    # unary-only preference for state 1
    m0 = np.asarray(g.marginals(0))
    assert m0[1] < 0.75        # unary alone would give 0.75
    return g


if __name__ == "__main__":
    main()
