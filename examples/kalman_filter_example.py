"""easyPoint2KalmanFilter analog: a 2D point moving right, three predict /
update cycles with an odometry-style motion model and direct measurements.

Reference: examples/easyPoint2KalmanFilter.cpp (KalmanFilter over Point2),
elaboratePoint2KalmanFilter.cpp.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from gtsam_tpu.linear.kalman import GaussianState, kf_init, kf_predict, \
    kf_update


def main():
    # x0 ~ N([0,0], 0.1 I)
    state = kf_init(jnp.zeros(2), 0.1 * jnp.eye(2))
    F = jnp.eye(2)                      # identity dynamics
    B = jnp.eye(2)                      # control moves the point
    u = jnp.asarray([1.0, 0.0])         # one unit right per step
    Q = 0.01 * jnp.eye(2)               # process noise (sigma 0.1)
    H = jnp.eye(2)                      # direct position measurement
    Rm = 0.01 * jnp.eye(2)              # measurement noise

    for k in range(1, 4):
        state = kf_predict(state, F, B, u, Q)
        print(f"predict x{k}: mean {np.round(np.asarray(state.mean), 3)} "
              f"cov diag {np.round(np.diagonal(np.asarray(state.cov)), 4)}")
        z = jnp.asarray([float(k), 0.0])
        state = kf_update(state, H, z, Rm)
        print(f"update  x{k}: mean {np.round(np.asarray(state.mean), 3)} "
              f"cov diag {np.round(np.diagonal(np.asarray(state.cov)), 4)}")

    # reference prints x3 ~ N([3, 0], ~0.0083 I)
    assert np.allclose(np.asarray(state.mean), [3.0, 0.0], atol=1e-6)
    return state


if __name__ == "__main__":
    main()
