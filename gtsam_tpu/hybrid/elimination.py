"""Hybrid sequential elimination: Gaussian-mixture factor graphs.

Reference: gtsam/hybrid/HybridGaussianFactorGraph.{h,cpp} — EliminateHybrid
(HybridGaussianFactorGraph.cpp:357 hybrid path): eliminating a continuous
variable runs dense Gaussian elimination once per assignment of the LOCAL
discrete separator (product over discrete keys of the involved factors only),
producing a HybridGaussianConditional plus a new mixture factor whose
per-assignment scalar carries the normalization constants; eliminating the
last continuous neighbors turns those scalars into genuine discrete factors
(HybridGaussianProductFactor bookkeeping).  Cost is exponential only in local
discrete separators, never in the total number of modes.

TPU-native design: the per-assignment Gaussian eliminations are ONE vmapped
dense QR over the assignment axis (identical static shapes by construction),
instead of the reference's DecisionTree recursion over heap-allocated
GaussianFactor nodes.
"""

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..discrete.discrete import DiscreteFactor, DiscreteFactorGraph
from ..graph import factors as factors_mod
from ..graph.values import Values

_LOG2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Linear hybrid factor: dense Gaussian blocks batched over the assignments of
# its local discrete keys.  density(x, m) = exp(logc[m] − 0.5‖A[m]x − b[m]‖²).
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GaussianMixtureFactor:
    ckeys: Tuple[int, ...]       # continuous keys (column order of A)
    cdims: Tuple[int, ...]
    dkeys: Tuple[int, ...]       # discrete keys, sorted; () for pure Gaussian
    cards: Tuple[int, ...]
    A: jnp.ndarray               # (M, r, sum(cdims)), M = prod(cards)
    b: jnp.ndarray               # (M, r)
    logc: jnp.ndarray            # (M,)

    @property
    def num_assignments(self) -> int:
        return int(np.prod(self.cards, dtype=np.int64)) if self.cards else 1


@dataclasses.dataclass
class HybridGaussianConditional:
    """p(x_frontal | separator, modes) — one triangular system per assignment."""

    frontal: int
    ckeys: Tuple[int, ...]       # separator continuous keys
    cdims: Tuple[int, ...]
    dkeys: Tuple[int, ...]
    cards: Tuple[int, ...]
    R: jnp.ndarray               # (M, dx, dx) upper triangular
    S: jnp.ndarray               # (M, dx, ds)
    d: jnp.ndarray               # (M, dx)

    def assignment_index(self, assignment: Dict[int, int]) -> int:
        idx = 0
        for k, c in zip(self.dkeys, self.cards):
            idx = idx * c + assignment[k]
        return idx

    def solve(self, assignment: Dict[int, int], parents: Dict[int, jnp.ndarray]):
        m = self.assignment_index(assignment)
        rhs = self.d[m]
        if self.ckeys:
            s = jnp.concatenate([jnp.ravel(parents[k]) for k in self.ckeys])
            rhs = rhs - self.S[m] @ s
        return jax.scipy.linalg.solve_triangular(self.R[m], rhs, lower=False)


@dataclasses.dataclass
class HybridBayesNet:
    """Elimination result: continuous conditionals (reverse order solvable)
    + discrete posterior factors over the modes."""

    conditionals: List[HybridGaussianConditional]
    discrete: DiscreteFactorGraph

    def mpe_discrete(self) -> Dict[int, int]:
        return self.discrete.optimize()

    def optimize(self, assignment: Optional[Dict[int, int]] = None):
        """Back-substitute the continuous part for a discrete assignment
        (default: the MPE assignment).  Returns (assignment, {key: delta})."""
        if assignment is None:
            assignment = self.mpe_discrete()
        sol: Dict[int, jnp.ndarray] = {}
        for cond in reversed(self.conditionals):
            sol[cond.frontal] = cond.solve(assignment, sol)
        return assignment, sol

    def discrete_posterior(self) -> Tuple[List[Dict[int, int]], np.ndarray]:
        """Exact normalized posterior over all joint mode assignments."""
        prod = self.discrete.product()
        keys, cards = prod.keys, prod.cards
        vals = np.asarray(prod.table, dtype=float).reshape(-1)
        assignments = []
        for flat in range(vals.size):
            a, rem = {}, flat
            for k, c in zip(reversed(keys), reversed(cards)):
                a[k] = rem % c
                rem //= c
            assignments.append(a)
        p = vals / vals.sum()
        return assignments, p


# ---------------------------------------------------------------------------
# Linearization: HybridFactorGraph (nonlinear, typed batches) → list of
# GaussianMixtureFactor (the HybridNonlinearFactorGraph::linearize analog).
# ---------------------------------------------------------------------------

def _noise_log_constant(noise, rdim: int) -> np.ndarray:
    """log(det W) − r/2·log 2π per factor row, W = whitening matrix."""
    base = -0.5 * rdim * _LOG2PI
    if noise.kind == "unit" or noise.data is None:
        return np.asarray([base])
    if noise.kind == "constrained":
        # sigma==0 rows have no finite Gaussian normalization constant; use
        # the mu-penalty relaxation (precision mu on hard rows — exactly the
        # density noise.error() scores, Constrained::squaredMahalanobis
        # semantics).  Constants of mode-independent constrained factors
        # cancel across hypotheses in the posterior softmax anyway.
        data = np.asarray(noise.data)   # inverse sigmas; 0 marks hard rows
        mu = getattr(noise, "mu", 1e6) or 1e6
        w = np.where(data == 0.0, np.sqrt(mu), data)
        return np.sum(np.log(w), axis=-1) + base
    data = np.asarray(noise.data)
    if noise.kind == "diagonal":
        return np.sum(np.log(data), axis=-1) + base
    # gaussian: data = upper-triangular sqrt information R
    diag = np.abs(np.diagonal(data, axis1=-2, axis2=-1))
    return np.sum(np.log(diag), axis=-1) + base


def _dense_rows(batch: factors_mod.FactorBatch, values: Values):
    """Per-row dense (A_i, b_i, logc_i) for a factor batch at `values`."""
    logc = _noise_log_constant(batch.noise, batch.rdim)  # before relaxation
    nz = batch.noise
    if nz is not None and nz.kind == "constrained":
        # mu-relaxation of the hard rows for the hybrid Gaussian algebra
        # (matches _noise_log_constant; whiten() would otherwise zero them)
        import dataclasses as _dc
        from ..base.noise import NoiseModel as _NM
        mu = getattr(nz, "mu", 1e6) or 1e6
        data = jnp.where(jnp.asarray(nz.data) == 0.0, float(np.sqrt(mu)),
                         jnp.asarray(nz.data))
        batch = _dc.replace(batch, noise=_NM("diagonal", data, nz.loss))
    xs = tuple(
        values.get_rows(t, values.rows_of(t, batch.keys[:, s]))
        for s, t in enumerate(batch.var_types)
    )
    J, b = factors_mod.linearize(batch, xs)
    A = jnp.concatenate(J, axis=2)  # (N, r, sum dims)
    if logc.shape[0] == 1:
        logc = np.repeat(logc, batch.num_factors)
    return A, b, logc


def linearize_hybrid(hfg, values: Values) -> List[GaussianMixtureFactor]:
    """Linearize continuous + mixture batches into GaussianMixtureFactors.
    Pure discrete factors pass through at elimination time."""
    out: List[GaussianMixtureFactor] = []
    for batch in hfg.continuous:
        A, b, logc = _dense_rows(batch, values)
        dims = batch.dims()
        for i in range(batch.num_factors):
            out.append(GaussianMixtureFactor(
                tuple(int(k) for k in batch.keys[i]), dims, (), (),
                A[i][None], b[i][None], jnp.asarray(logc[i])[None]))
    for m in hfg.mixtures:
        per_comp = [_dense_rows(c, values) for c in m.components]
        k0 = m.components[0]
        dims = k0.dims()
        for i in range(k0.num_factors):
            A = jnp.stack([pc[0][i] for pc in per_comp])
            b = jnp.stack([pc[1][i] for pc in per_comp])
            logc = jnp.asarray(np.stack([pc[2][i] for pc in per_comp]))
            out.append(GaussianMixtureFactor(
                tuple(int(k) for k in k0.keys[i]), dims,
                (m.discrete_key,), (m.cardinality,), A, b, logc))
    return out


# ---------------------------------------------------------------------------
# The hybrid eliminate step.
# ---------------------------------------------------------------------------

def _lift_index(dkeys_f, cards_f, dkeys_u, cards_u) -> np.ndarray:
    """Map each joint assignment of dkeys_u to the factor's flat index."""
    M = int(np.prod(cards_u, dtype=np.int64)) if cards_u else 1
    pos = {k: i for i, k in enumerate(dkeys_u)}
    idx = np.zeros(M, dtype=np.int64)
    if not dkeys_f:
        return idx
    # digits of the joint index, row-major over dkeys_u
    grid = np.indices(cards_u).reshape(len(cards_u), -1)
    for k, c in zip(dkeys_f, cards_f):
        idx = idx * c + grid[pos[k]]
    return idx


def eliminate_one(factors: List[GaussianMixtureFactor], key: int
                  ) -> Tuple[HybridGaussianConditional,
                             Optional[GaussianMixtureFactor],
                             List[GaussianMixtureFactor]]:
    """Eliminate continuous `key`: returns (conditional, new factor or None,
    untouched factors).  Reference: HybridGaussianFactorGraph.cpp:357."""
    involved = [f for f in factors if key in f.ckeys]
    rest = [f for f in factors if key not in f.ckeys]
    if not involved:
        raise ValueError(f"continuous key {key} not present")

    # union separator layout: [key | other continuous keys]
    dx = None
    sep: Dict[int, int] = {}
    for f in involved:
        for k, d in zip(f.ckeys, f.cdims):
            if k == key:
                dx = d
            else:
                sep.setdefault(k, d)
    sep_keys = tuple(sorted(sep))
    sep_dims = tuple(sep[k] for k in sep_keys)
    col_of = {key: 0}
    off = dx
    for k in sep_keys:
        col_of[k] = off
        off += sep[k]
    Dtot = off

    # union discrete separator
    dk: Dict[int, int] = {}
    for f in involved:
        for k, c in zip(f.dkeys, f.cards):
            dk.setdefault(k, c)
    dkeys_u = tuple(sorted(dk))
    cards_u = tuple(dk[k] for k in dkeys_u)
    M = int(np.prod(cards_u, dtype=np.int64)) if cards_u else 1

    rows = sum(f.A.shape[1] for f in involved)
    if rows < dx:
        raise ValueError(
            f"under-determined elimination of key {key}: {rows} rows < dim {dx}")

    # assemble the joint (M, rows, Dtot) system — lifting each factor's
    # assignment axis onto the union assignment space
    logc = jnp.zeros(M)
    r0 = 0
    Aj = jnp.zeros((M, rows, Dtot))
    bj = jnp.zeros((M, rows))
    for f in involved:
        lift = _lift_index(f.dkeys, f.cards, dkeys_u, cards_u)
        fa = f.A[lift]           # (M, r_f, sum f dims)
        fb = f.b[lift]
        logc = logc + f.logc[lift]
        c0 = 0
        for k, d in zip(f.ckeys, f.cdims):
            Aj = Aj.at[:, r0:r0 + fa.shape[1],
                       col_of[k]:col_of[k] + d].add(fa[:, :, c0:c0 + d])
            c0 += d
        bj = bj.at[:, r0:r0 + fb.shape[1]].set(fb)
        r0 += fa.shape[1]

    # one vmapped QR over the assignment axis
    q, r_ = jnp.linalg.qr(Aj, mode="reduced")       # (M, rows, t), (M, t, Dtot)
    c = jnp.einsum("mrt,mr->mt", q, bj)             # Qᵀ b
    e2 = jnp.maximum(jnp.sum(bj * bj, axis=1) - jnp.sum(c * c, axis=1), 0.0)

    R_x = r_[:, :dx, :dx]
    S = r_[:, :dx, dx:]
    d_ = c[:, :dx]
    # sign-normalize so diag(R_x) > 0 (QR sign ambiguity)
    sgn = jnp.sign(jnp.diagonal(R_x, axis1=1, axis2=2))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    R_x = R_x * sgn[:, :, None]
    S = S * sgn[:, :, None]
    d_ = d_ * sgn

    cond = HybridGaussianConditional(
        key, sep_keys, sep_dims, dkeys_u, cards_u, R_x, S, d_)

    # remaining factor on the separator; its scalar absorbs the conditional's
    # normalization and the least-squares residual e²
    logdetR = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(R_x, axis1=1, axis2=2))
                              + 1e-300), axis=1)
    logc_new = logc + 0.5 * dx * _LOG2PI - logdetR - 0.5 * e2
    t = r_.shape[1]
    A_rem = r_[:, dx:t, dx:]
    b_rem = c[:, dx:t]
    new_f = GaussianMixtureFactor(sep_keys, sep_dims, dkeys_u, cards_u,
                                  A_rem, b_rem, logc_new)
    return cond, new_f, rest


def eliminate_sequential(factors: List[GaussianMixtureFactor],
                         ordering: Sequence[int],
                         discrete_factors: Sequence[DiscreteFactor] = ()
                         ) -> HybridBayesNet:
    """Eliminate all continuous keys in `ordering`, then convert the residual
    mixture scalars into discrete factors (joined with any pure discrete
    priors) — the EliminateHybrid → discreteElimination pipeline."""
    conditionals = []
    work = list(factors)
    for key in ordering:
        cond, new_f, work = eliminate_one(work, key)
        conditionals.append(cond)
        if new_f is not None:
            work.append(new_f)

    dfg = DiscreteFactorGraph()
    for f in work:
        if f.ckeys and f.A.shape[2] > 0 and f.A.shape[1] > 0:
            raise ValueError("continuous keys remain after ordering")
        chi2 = jnp.sum(f.b * f.b, axis=1) if f.b.size else jnp.zeros(
            f.num_assignments)
        logv = f.logc - 0.5 * chi2
        logv = logv - jnp.max(logv)
        table = np.asarray(jnp.exp(logv)).reshape(f.cards if f.cards else (1,))
        if f.dkeys:
            dfg.add(f.dkeys, f.cards, table)
    for df in discrete_factors:
        dfg.add_factor(df)
    return HybridBayesNet(conditionals, dfg)


def solve_hybrid(hfg, values: Values, ordering: Optional[Sequence[int]] = None
                 ) -> Tuple[Dict[int, int], Dict[int, jnp.ndarray]]:
    """One hybrid GN step: linearize at `values`, eliminate, MPE + deltas."""
    factors = linearize_hybrid(hfg, values)
    if ordering is None:
        seen = []
        for f in factors:
            for k in f.ckeys:
                if k not in seen:
                    seen.append(k)
        ordering = seen
    bn = eliminate_sequential(factors, ordering, hfg.discrete)
    return bn.optimize()


# ---------------------------------------------------------------------------
# HybridSmoother (gtsam/hybrid/HybridSmoother.{h,cpp}): incremental hybrid
# estimation with mode pruning.  Each update linearizes the new slice, joins
# it with the running discrete posterior, eliminates, and prunes the mode
# space to `max_assignments` leaves (HybridBayesNet::prune analog) so the
# assignment axis stays bounded over time.
# ---------------------------------------------------------------------------

class HybridSmoother:
    def __init__(self, max_assignments: int = 16):
        self.max_assignments = max_assignments
        self.hfg = None            # running HybridFactorGraph
        self.bayes_net: Optional[HybridBayesNet] = None

    def update(self, hfg, values: Values,
               ordering: Optional[Sequence[int]] = None) -> HybridBayesNet:
        from .hybrid import HybridFactorGraph  # local import to avoid cycle
        if self.hfg is None:
            self.hfg = HybridFactorGraph()
        self.hfg.continuous += hfg.continuous
        self.hfg.mixtures += hfg.mixtures
        self.hfg.discrete += hfg.discrete
        factors = linearize_hybrid(self.hfg, values)
        if ordering is None:
            seen = []
            for f in factors:
                for k in f.ckeys:
                    if k not in seen:
                        seen.append(k)
            ordering = seen
        bn = eliminate_sequential(factors, ordering, self.hfg.discrete)
        self._prune(bn)
        self.bayes_net = bn
        return bn

    def _prune(self, bn: HybridBayesNet) -> None:
        """Keep the top-K joint assignments: zero out the rest of the joint
        discrete factor (the reference prunes DecisionTree leaves)."""
        if not bn.discrete.factors:
            return
        prod = bn.discrete.product()
        flat = np.asarray(prod.table, dtype=float).reshape(-1)
        if flat.size <= self.max_assignments:
            return
        keep = np.argsort(-flat)[: self.max_assignments]
        mask = np.zeros_like(flat)
        mask[keep] = flat[keep]
        bn.discrete.factors[:] = [DiscreteFactor(
            prod.keys, prod.cards, jnp.asarray(mask.reshape(prod.cards)))]
