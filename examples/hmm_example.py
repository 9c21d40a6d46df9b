"""HMMExample analog: a hidden Markov model as a discrete factor graph —
transition conditionals along a chain, per-step emission evidence, queried
for the MPE path (Viterbi via max-product elimination) and smoothed
marginals (sum-product).

Reference: examples/HMMExample.cpp (DiscreteBayesNet chain + likelihoods).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gtsam_tpu.discrete.discrete import DiscreteFactorGraph


def main(T=5):
    # 2-state weather HMM: sticky transitions, informative observations
    prior = np.array([0.6, 0.4])
    trans = np.array([[0.8, 0.2],          # P(x_{t+1} | x_t)
                      [0.3, 0.7]])
    emit = np.array([[0.9, 0.1],           # P(z | x): state 0 emits 0
                     [0.2, 0.8]])
    observations = [0, 0, 1, 1, 1]

    g = DiscreteFactorGraph()
    g.add([0], [2], prior)
    for t in range(T - 1):
        g.add([t, t + 1], [2, 2], trans)
    for t, z in enumerate(observations):
        g.add([t], [2], emit[:, z])        # likelihood slice for observed z

    mpe = g.optimize()
    path = [mpe[t] for t in range(T)]
    print("observations:", observations)
    print("Viterbi path:", path)
    for t in range(T):
        m = np.asarray(g.marginals(t))
        print(f"  P(x{t}) = {np.round(m, 4)}")

    # brute-force Viterbi oracle
    best, best_p = None, -1.0
    for code in range(2 ** T):
        xs = [(code >> t) & 1 for t in range(T)]
        p = prior[xs[0]] * np.prod([trans[xs[t], xs[t + 1]]
                                    for t in range(T - 1)])
        p *= np.prod([emit[xs[t], observations[t]] for t in range(T)])
        if p > best_p:
            best, best_p = xs, p
    assert path == best, (path, best)
    return g


if __name__ == "__main__":
    main()
