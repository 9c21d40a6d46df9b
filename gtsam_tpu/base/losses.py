"""Robust loss functions (m-estimators), vectorized.

Mirrors the reference zoo in gtsam/linear/LossFunctions.h (Fair:182, Huber:217,
Cauchy:257, Tukey:293, Welsch:328, GemanMcClure:366, DCS:406,
L2WithDeadZone:447).  Each loss provides
  weight(d): the IRLS weight w(d) applied to whitened rows (d = whitened norm)
  loss(d):   rho(d), the contribution to total error
following the reference's (distance, not squared-distance) convention.
"""

import dataclasses
from typing import Callable

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Loss:
    name: str
    weight: Callable
    loss: Callable


def null():
    return Loss("null", lambda d: jnp.ones_like(d), lambda d: 0.5 * d * d)


def fair(c=1.3998):
    def weight(d):
        return 1.0 / (1.0 + jnp.abs(d) / c)

    def loss(d):
        ad = jnp.abs(d) / c
        return c * c * (ad - jnp.log1p(ad))

    return Loss("fair", weight, loss)


def huber(k=1.345):
    def weight(d):
        ad = jnp.abs(d)
        return jnp.where(ad <= k, 1.0, k / jnp.maximum(ad, 1e-30))

    def loss(d):
        ad = jnp.abs(d)
        return jnp.where(ad <= k, 0.5 * d * d, k * ad - 0.5 * k * k)

    return Loss("huber", weight, loss)


def cauchy(k=0.1):
    k2 = k * k

    def weight(d):
        return k2 / (k2 + d * d)

    def loss(d):
        return 0.5 * k2 * jnp.log1p(d * d / k2)

    return Loss("cauchy", weight, loss)


def tukey(c=4.6851):
    c2 = c * c

    def weight(d):
        r = d * d / c2
        return jnp.where(jnp.abs(d) <= c, (1.0 - r) ** 2, 0.0)

    def loss(d):
        r = jnp.minimum(d * d / c2, 1.0)
        return c2 / 6.0 * (1.0 - (1.0 - r) ** 3)

    return Loss("tukey", weight, loss)


def welsch(c=2.9846):
    c2 = c * c

    def weight(d):
        return jnp.exp(-d * d / c2)

    def loss(d):
        return 0.5 * c2 * (1.0 - jnp.exp(-d * d / c2))

    return Loss("welsch", weight, loss)


def geman_mcclure(c=1.0):
    def weight(d):
        c2 = c * c
        return (c2 / (c2 + d * d)) ** 2

    def loss(d):
        c2 = c * c
        return 0.5 * c2 * d * d / (c2 + d * d)

    return Loss("geman_mcclure", weight, loss)


def dcs(c=1.0):
    def weight(d):
        e2 = d * d
        return jnp.where(e2 > c, (2.0 * c / (c + e2)) ** 2, 1.0)

    def loss(d):
        e2 = d * d
        return jnp.where(e2 > c, 2.0 * c * e2 / (c + e2) - c, 0.5 * e2)

    return Loss("dcs", weight, loss)


def l2_with_dead_zone(k=1.0):
    def weight(d):
        ad = jnp.abs(d)
        return jnp.where(ad <= k, 0.0, (ad - k) / jnp.maximum(ad, 1e-30))

    def loss(d):
        ad = jnp.abs(d)
        return jnp.where(ad <= k, 0.0, 0.5 * (ad - k) ** 2)

    return Loss("l2_with_dead_zone", weight, loss)


LOSSES = {
    "null": null,
    "fair": fair,
    "huber": huber,
    "cauchy": cauchy,
    "tukey": tukey,
    "welsch": welsch,
    "geman_mcclure": geman_mcclure,
    "dcs": dcs,
    "l2_with_dead_zone": l2_with_dead_zone,
}
