"""DiscreteBayesNet_FG analog: the classic "Wet Grass" Bayes net built from
Signature strings, queried by exact elimination — marginals, MPE, and
conditioning on evidence.

Reference: examples/DiscreteBayesNet_FG.cpp (Cloudy/Sprinkler/Rain/WetGrass,
Signature mini-language "W | S, R = ...", sum-product marginals + argmax).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gtsam_tpu.discrete.discrete import (DiscreteBayesNet, from_signature)


def main():
    # key ids and cardinalities (all binary): 0=Cloudy 1=Sprinkler 2=Rain 3=WetGrass
    keys = {"C": (0, 2), "S": (1, 2), "R": (2, 2), "W": (3, 2)}
    bn = DiscreteBayesNet()
    # index 0 = False, 1 = True; "a/b" rows normalize to P(False)/P(True)
    bn.add(from_signature("W | S, R = 1/0 1/9 1/9 1/99", keys))
    bn.add(from_signature("S | C = 1/1 9/1", keys))
    bn.add(from_signature("R | C = 4/1 1/4", keys))
    bn.add(from_signature("C = 1/1", keys))

    fg = bn.to_graph()

    # joint normalizes to 1 by construction
    total = 0.0
    for c in range(2):
        for s in range(2):
            for r in range(2):
                for w in range(2):
                    total += bn.evaluate({0: c, 1: s, 2: r, 3: w})
    print("sum over joint:", total)
    assert abs(total - 1.0) < 1e-9

    # P(WetGrass) marginal by sum-product elimination
    pw = np.asarray(fg.marginals(3))
    print("P(WetGrass) =", np.round(pw, 4))

    # most probable explanation
    mpe = fg.optimize()
    print("MPE:", {name: mpe[k] for name, (k, _) in keys.items()})

    # condition on Cloudy=0, Sprinkler=1 (add evidence factors) and re-query
    ev = fg.__class__(list(fg.factors))
    ev.add([0], [2], np.array([1.0, 0.0]))
    ev.add([1], [2], np.array([0.0, 1.0]))
    pw_e = np.asarray(ev.marginals(3))
    print("P(W | C=0, S=1) =", np.round(pw_e, 4))
    assert pw_e[1] > pw[1]    # evidence of sprinkler raises P(wet)
    return bn


if __name__ == "__main__":
    main()
