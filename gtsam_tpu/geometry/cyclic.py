"""Cyclic group Z_N — gtsam/geometry/Cyclic.h: the additive group of integers
mod N, used in the reference to test the group concept machinery.  Elements
are integer arrays; all ops vectorize."""

import jax.numpy as jnp


class Cyclic:
    """Z_N as a group object (the reference parameterizes by template N)."""

    def __init__(self, n: int):
        assert n >= 1
        self.n = n

    def identity(self):
        return jnp.zeros((), dtype=jnp.int32)

    def compose(self, a, b):
        return jnp.mod(a + b, self.n)

    def inverse(self, a):
        return jnp.mod(-a, self.n)

    def between(self, a, b):
        return jnp.mod(b - a, self.n)
