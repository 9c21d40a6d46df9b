"""Vectorized noise models for factor batches.

Reference analog: gtsam/linear/NoiseModel.h:42-146 (Gaussian/Diagonal/Isotropic/
Unit/Robust).  A NoiseModel here describes the noise of ALL N factors in a batch
at once; whiten operates on (N, rdim) residual stacks and (N, rdim, d) Jacobian
stacks.  Representation is the square-root information factor R (whitened = R r),
stored per-batch as either a scalar, per-row diagonal, or full (N, rdim, rdim).

Constrained models (sigma == 0 rows, NoiseModel.h:260) come in two forms:
`sigmas` with zero entries substitutes a large finite precision (XLA-friendly,
works with every solver), while `constrained` marks the zero-sigma rows as
EXACT equality constraints — the dense solver then eliminates them through an
equality-constrained (KKT) solve, matching the reference's constraint-aware QR
rank logic (NoiseModel.h:260, Constrained override :514) to machine precision.
"""

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import losses as losses_mod

_MAX_PRECISION = 1e8  # effective precision substituted for sigma == 0 rows


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class NoiseModel:
    """kind: 'unit' | 'diagonal' | 'gaussian'; optional robust loss on top.

    data:
      unit      -> None
      diagonal  -> (N, rdim) inverse sigmas (precisions^0.5)
      gaussian  -> (N, rdim, rdim) upper-triangular-ish sqrt information R
    """

    kind: str
    data: Optional[Any] = None
    loss: Optional[losses_mod.Loss] = None
    # 'constrained' kind only: penalty weight mu applied to the hard rows when
    # reporting error (reference Constrained mu, NoiseModel.h:260 default 1000)
    mu: float = 1000.0

    def tree_flatten(self):
        return (self.data,), (self.kind, self.loss, self.mu)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], aux[1], aux[2])

    # -- whitening ---------------------------------------------------------

    def whiten(self, r):
        """(N, rdim) -> (N, rdim)  (no robust reweighting).

        For 'constrained', the hard (sigma == 0) rows have weight 0 here —
        they are removed from the soft least-squares system and handled
        exactly by the solver's KKT path (BoundGraph.constraint_system)."""
        if self.kind == "unit":
            return r
        if self.kind in ("diagonal", "constrained"):
            return r * self.data
        return jnp.einsum("nij,nj->ni", self.data, r)

    def whiten_jacobian(self, A):
        """(N, rdim, d) -> (N, rdim, d)."""
        if self.kind == "unit":
            return A
        if self.kind in ("diagonal", "constrained"):
            return A * self.data[..., None]
        return jnp.einsum("nij,njd->nid", self.data, A)

    def robust_weights(self, wr):
        """IRLS sqrt-weights from whitened residuals (N, rdim) -> (N,)."""
        if self.loss is None:
            return None
        d = jnp.linalg.norm(wr, axis=-1)
        return jnp.sqrt(self.loss.weight(d))

    def error(self, r):
        """Total error contribution (GTSAM factor error semantics): sum over batch
        of 0.5||whiten(r)||^2, or rho(||whiten(r)||) when robust.

        'constrained' adds 0.5*mu*r^2 on the hard rows (reference
        Constrained::squaredMahalanobisDistance: precision mu on sigma==0 rows)
        so LM accept/reject sees constraint violations."""
        wr = self.whiten(r)
        if self.kind == "constrained":
            hard = self.data == 0
            pen = 0.5 * self.mu * jnp.sum(jnp.where(hard, r, 0.0) ** 2)
            return 0.5 * jnp.sum(wr * wr) + pen
        if self.loss is None:
            return 0.5 * jnp.sum(wr * wr)
        d = jnp.linalg.norm(wr, axis=-1)
        return jnp.sum(self.loss.loss(d))

    def with_loss(self, loss) -> "NoiseModel":
        if isinstance(loss, str):
            loss = losses_mod.LOSSES[loss]()
        if self.kind == "constrained":
            # Reference Constrained models are not robustified; error() would
            # silently ignore the loss on the hard rows, so reject explicitly.
            raise NotImplementedError(
                "robust loss on a constrained noise model is not supported"
            )
        return NoiseModel(self.kind, self.data, loss, self.mu)


# -- constructors ----------------------------------------------------------


def unit() -> NoiseModel:
    return NoiseModel("unit")


def sigmas(s) -> NoiseModel:
    """Per-row standard deviations, (rdim,) or (N, rdim); zeros -> constrained rows."""
    s = jnp.atleast_2d(jnp.asarray(s))
    inv = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-300), jnp.sqrt(_MAX_PRECISION))
    return NoiseModel("diagonal", inv)


def isotropic(rdim: int, sigma: float) -> NoiseModel:
    return sigmas(np.full((1, rdim), sigma))


def precisions(p) -> NoiseModel:
    p = jnp.atleast_2d(jnp.asarray(p))
    return NoiseModel("diagonal", jnp.sqrt(p))


def information(M) -> NoiseModel:
    """Full information matrices, (rdim, rdim) or (N, rdim, rdim).

    sqrt information R = chol(M)^T (upper), whiten(r) = R r — matches
    noiseModel::Gaussian::Information (NoiseModel.cpp).
    """
    M = jnp.asarray(M)
    if M.ndim == 2:
        M = M[None]
    L = jnp.linalg.cholesky(M)
    R = jnp.swapaxes(L, -1, -2)
    return NoiseModel("gaussian", R)


def covariance(S) -> NoiseModel:
    S = jnp.asarray(S)
    if S.ndim == 2:
        S = S[None]
    return information(jnp.linalg.inv(S))


def constrained(s, mu: float = 1000.0) -> NoiseModel:
    """Mixed hard/soft diagonal model (reference noiseModel::Constrained::
    MixedSigmas, NoiseModel.h:260).  Rows with sigma == 0 are EXACT equality
    constraints: the dense solver eliminates them via a KKT system; `mu`
    only weights their violation in the reported error."""
    s = jnp.atleast_2d(jnp.asarray(s))
    inv = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-300), 0.0)
    return NoiseModel("constrained", inv, mu=mu)


def constrained_all(rdim: int, mu: float = 1000.0) -> NoiseModel:
    """All-rows-hard model (noiseModel::Constrained::All)."""
    return constrained(np.zeros((1, rdim)), mu=mu)


def robust(base: NoiseModel, loss) -> NoiseModel:
    return base.with_loss(loss)
