"""Hybrid (discrete x Gaussian) inference.

Reference: gtsam/hybrid — HybridGaussianFactor (discrete-indexed Gaussians),
HybridGaussianFactorGraph.h:105 with EliminateHybrid:58 (per-assignment Gaussian
elimination + discrete factor from normalization constants), HybridBayesNet
pruning, HybridNonlinearFactor (mixture of nonlinear factors), HybridValues.

TPU-native round-1 design: mixture factors are factor batches with a leading
COMPONENT axis; inference enumerates the discrete assignment space (the
reference's DecisionTree enumerates too) and the per-assignment continuous
solves batch/vmap on device.  The discrete posterior follows the exact Gaussian
evidence: P(m | z) ∝ prior(m) * exp(-0.5*chi2_min(m)) / sqrt(det H_m) — the
normalization-constant bookkeeping of HybridGaussianFactorGraph.cpp:357.
"""

import dataclasses
import itertools
import math
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..discrete.discrete import DiscreteFactor
from ..graph import factors as factors_mod
from ..graph.graph import FactorGraph
from ..graph.values import Values
from ..optimize import optimizers as opt_mod


@dataclasses.dataclass
class MixtureFactorBatch:
    """One discrete key selects among K same-shape continuous factor batches.

    Reference analog: HybridGaussianFactor / HybridNonlinearFactor (a
    discrete-indexed collection of factors on the same continuous keys).
    """

    discrete_key: int
    cardinality: int
    components: List[factors_mod.FactorBatch]

    def __post_init__(self):
        assert len(self.components) == self.cardinality


@dataclasses.dataclass
class HybridValues:
    """Continuous Values + discrete assignment (gtsam HybridValues analog)."""

    continuous: Values
    discrete: Dict[int, int]


class HybridFactorGraph:
    """Continuous batches + mixture batches + pure discrete factors."""

    def __init__(self):
        self.continuous: List[factors_mod.FactorBatch] = []
        self.mixtures: List[MixtureFactorBatch] = []
        self.discrete: List[DiscreteFactor] = []

    def add(self, batch: factors_mod.FactorBatch) -> "HybridFactorGraph":
        self.continuous.append(batch)
        return self

    def add_mixture(self, m: MixtureFactorBatch) -> "HybridFactorGraph":
        self.mixtures.append(m)
        return self

    def add_discrete(self, f: DiscreteFactor) -> "HybridFactorGraph":
        self.discrete.append(f)
        return self

    def discrete_keys(self) -> Dict[int, int]:
        out = {}
        for m in self.mixtures:
            out[m.discrete_key] = m.cardinality
        for f in self.discrete:
            for k, c in zip(f.keys, f.cards):
                out.setdefault(k, c)
        return out

    def graph_for(self, assignment: Dict[int, int]) -> FactorGraph:
        batches = list(self.continuous)
        for m in self.mixtures:
            batches.append(m.components[assignment[m.discrete_key]])
        return FactorGraph(batches)

    # -- inference ---------------------------------------------------------

    def _assignments(self):
        dk = self.discrete_keys()
        keys = sorted(dk)
        for combo in itertools.product(*[range(dk[k]) for k in keys]):
            yield dict(zip(keys, combo))

    def optimize(self, initial: Values,
                 params: Optional[opt_mod.LMParams] = None) -> HybridValues:
        """MPE over (discrete, continuous): per-assignment LM + Gaussian evidence."""
        params = params or opt_mod.LMParams()
        best, best_lp, best_vals = None, -math.inf, None
        for a in self._assignments():
            g = self.graph_for(a)
            res = opt_mod.levenberg_marquardt(g, initial, params)
            lp = self._log_evidence(g, res, a)
            if lp > best_lp:
                best, best_lp, best_vals = a, lp, res.values
        return HybridValues(best_vals, best or {})

    def discrete_posterior(self, initial: Values,
                           params: Optional[opt_mod.LMParams] = None
                           ) -> Tuple[List[Dict[int, int]], np.ndarray]:
        """Normalized posterior over discrete assignments (Laplace evidence)."""
        params = params or opt_mod.LMParams()
        assignments, lps = [], []
        for a in self._assignments():
            g = self.graph_for(a)
            res = opt_mod.levenberg_marquardt(g, initial, params)
            assignments.append(a)
            lps.append(self._log_evidence(g, res, a))
        lps = np.asarray(lps)
        p = np.exp(lps - lps.max())
        return assignments, p / p.sum()

    def _log_evidence(self, g: FactorGraph, res, assignment) -> float:
        """Exact (for linear factors; Laplace otherwise) log p(z | m):
        Σ log-normalizers − chi2_min/2 + D/2·log 2π − 0.5·log det H + log prior.
        Matches HybridGaussianFactorGraph.cpp:357's constant bookkeeping."""
        from .elimination import _noise_log_constant
        bound = g.bind(res.values)
        H, _ = bound.gn_system(res.values.arrays)
        sign, logdet = np.linalg.slogdet(np.asarray(H))
        logc = 0.0
        for b in g.batches:
            lc = _noise_log_constant(b.noise, b.rdim)
            logc += float(lc.sum()) if lc.shape[0] > 1 \
                else float(lc[0]) * b.num_factors
        D = H.shape[0]
        lp = logc - res.error + 0.5 * D * math.log(2 * math.pi) \
            - 0.5 * float(logdet)
        for f in self.discrete:
            if all(k in assignment for k in f.keys):
                lp += math.log(max(f.value(assignment), 1e-300))
        return lp

    def prune(self, initial: Values, max_assignments: int,
              params: Optional[opt_mod.LMParams] = None):
        """Keep the top-K discrete assignments (HybridBayesNet::prune analog)."""
        assignments, probs = self.discrete_posterior(initial, params)
        order = np.argsort(-probs)[:max_assignments]
        return [assignments[i] for i in order], probs[order] / probs[order].sum()


def mixture_between_factors(tname: str, discrete_key: int, keys1, keys2,
                            measurements_per_component, noises
                            ) -> MixtureFactorBatch:
    """Mixture of BetweenFactors (e.g. slip/no-slip, loop-closure hypotheses)."""
    comps = [
        factors_mod.between_factors(tname, keys1, keys2, meas, noise)
        for meas, noise in zip(measurements_per_component, noises)
    ]
    return MixtureFactorBatch(discrete_key, len(comps), comps)
