"""SimpleRotation analog: optimize a single rotation toward a prior.

The reference uses Rot2 (a 30-degree prior, initialized 20 degrees off);
here the same one-variable/one-factor graph runs on the SO3 manifold with a
rotation about z, exercising prior_factors + LM on a pure rotation type.

Reference: examples/SimpleRotation.cpp.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import gtsam_tpu as gt
from gtsam_tpu.geometry import so3


def rz(deg):
    return so3.expmap(jnp.asarray([0.0, 0.0, np.deg2rad(deg)]))


def main():
    prior = rz(30.0)
    print("goal angle: 30 degrees about z")

    graph = gt.FactorGraph()
    graph.add(gt.prior_factors("SO3", [0], prior[None],
                               gt.noise.isotropic(3, np.deg2rad(1.0))))

    initial = gt.Values.from_entries([(0, "SO3", rz(20.0))])
    res = gt.levenberg_marquardt(graph, initial)

    R = np.asarray(res.values.at(0))
    angle = np.rad2deg(np.arctan2(R[1, 0], R[0, 0]))
    print(f"optimized angle: {angle:.4f} degrees, error {res.error:.2e}")
    assert abs(angle - 30.0) < 1e-3
    return res


if __name__ == "__main__":
    main()
