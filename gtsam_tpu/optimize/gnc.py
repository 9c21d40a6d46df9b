"""Graduated non-convexity (GNC) robust optimization.

Reference: gtsam/nonlinear/GncOptimizer.h:44 (initializeMu:194, updateMu:277),
GncParams.h — GM and TLS surrogates with a mu continuation schedule wrapping any
inner optimizer; per-factor inlier weights reweight the noise models.
"""

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import chi2 as chi2_dist

from ..base.noise import NoiseModel
from ..graph import factors as factors_mod
from ..graph.graph import FactorGraph
from ..graph.values import Values
from . import optimizers as opt_mod


@dataclasses.dataclass
class GncParams:
    loss_type: str = "TLS"            # "GM" | "TLS"
    max_iterations: int = 20
    barc_quantile: float = 0.99       # inlier threshold via chi2 quantile
    mu_step: float = 1.4
    relative_cost_tol: float = 1e-5
    weights_tol: float = 1e-4
    inner: Optional[opt_mod.LMParams] = None
    robust_batches: Optional[Sequence[int]] = None  # indices; None = all


def _scale_noise(noise: NoiseModel, w: jnp.ndarray) -> NoiseModel:
    """Reweight a batch noise model by per-factor sqrt-weights."""
    sw = jnp.sqrt(w)
    if noise.kind == "unit":
        n = len(w)
        return NoiseModel("diagonal", jnp.ones((n, 1)) * sw[:, None], noise.loss)
    if noise.kind == "diagonal":
        data = jnp.broadcast_to(noise.data, (len(w), noise.data.shape[-1]))
        return NoiseModel("diagonal", data * sw[:, None], noise.loss)
    return NoiseModel("gaussian", noise.data * sw[:, None, None], noise.loss)


def _factor_chi2(graph: FactorGraph, values: Values, batch_idx: List[int]):
    """Per-factor squared whitened residuals (2 * factor error)."""
    bound = graph.bind(values)
    out = []
    for bi in batch_idx:
        b = graph.batches[bi]
        st = bound.structures[bi]
        xs = tuple(
            jax.tree.map(lambda a: a[st.rows[s]], values.arrays[t])
            for s, t in enumerate(b.var_types))
        r = factors_mod.residuals(b, xs)
        wr = b.noise.whiten(r)
        out.append(jnp.sum(wr * wr, axis=1))
    return out


def gnc_optimize(graph: FactorGraph, initial: Values,
                 params: Optional[GncParams] = None) -> opt_mod.OptimizeResult:
    params = params or GncParams()
    inner = params.inner or opt_mod.LMParams(max_iterations=50)
    robust_idx = list(params.robust_batches
                      if params.robust_batches is not None
                      else range(len(graph.batches)))

    barc_sq = {bi: chi2_dist.ppf(params.barc_quantile, graph.batches[bi].rdim)
               for bi in robust_idx}

    # initial fit (unweighted)
    res = opt_mod.levenberg_marquardt(graph, initial, inner)
    values = res.values
    r2 = _factor_chi2(graph, values, robust_idx)

    # initialize mu (GncOptimizer.h:194)
    r2max = max(float(jnp.max(x)) for x in r2)
    if params.loss_type == "GM":
        mu = 2.0 * r2max / float(np.mean(list(barc_sq.values())))
    else:  # TLS
        denom = 2.0 * r2max / float(np.mean(list(barc_sq.values()))) - 1.0
        mu = 1.0 / max(denom, 1e-6)
    prev_cost = res.error
    weights = [jnp.ones_like(x) for x in r2]

    for it in range(params.max_iterations):
        # weights update (GncOptimizer::calculateWeights)
        new_weights = []
        for x, bi in zip(r2, robust_idx):
            bc = barc_sq[bi]
            if params.loss_type == "GM":
                w = (mu * bc / (x + mu * bc)) ** 2
            else:  # TLS
                up = bc * (mu + 1.0) / mu
                lo = bc * mu / (mu + 1.0)
                w_mid = jnp.sqrt(jnp.maximum(bc * mu * (mu + 1.0) /
                                             jnp.maximum(x, 1e-12), 0.0)) - mu
                w = jnp.where(x >= up, 0.0,
                              jnp.where(x <= lo, 1.0, jnp.clip(w_mid, 0.0, 1.0)))
            new_weights.append(w)
        weights = new_weights

        # weighted inner optimization
        wg = FactorGraph()
        wi = 0
        for bi, b in enumerate(graph.batches):
            if bi in robust_idx:
                w = weights[robust_idx.index(bi)]
                wb = dataclasses.replace(b, noise=_scale_noise(b.noise, w))
                wg.add(wb)
            else:
                wg.add(b)
        res = opt_mod.levenberg_marquardt(wg, values, inner)
        values = res.values
        r2 = _factor_chi2(graph, values, robust_idx)

        # mu update + convergence (GncOptimizer::updateMu / checkConvergence)
        if params.loss_type == "GM":
            mu = max(1.0, mu / params.mu_step)
            mu_converged = mu <= 1.0 + 1e-9
        else:
            mu = mu * params.mu_step
            mu_converged = False
        cost = res.error
        if mu_converged or abs(prev_cost - cost) < params.relative_cost_tol * max(
                prev_cost, 1e-12):
            break
        prev_cost = cost

    # attach final weights for inspection
    res.history.append(("gnc_weights", [np.asarray(w) for w in weights]))
    return res
