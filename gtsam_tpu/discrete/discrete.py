"""Discrete inference: factors as dense probability tables, elimination as
tensor contractions.

Reference: gtsam/discrete — DecisionTreeFactor/TableFactor (ADD-style trees,
DecisionTree.h:62), DiscreteFactorGraph.h:98 with EliminateDiscrete:52
(sum-product) and EliminateForMPE:65 (max-product + DiscreteLookupDAG argmax
back-pass), DiscreteConditional, DiscreteMarginals, Signature ("A|B=..." CPT
mini-language, Signature.h).

TPU-native design: an assignment table IS a dense ndarray over the variable
cardinalities (what the reference's trees compress); products/marginals are
broadcasting multiplies and axis reductions — XLA-fusable, batched, static.
"""

import dataclasses
import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from ..config import default_dtype as _default_dtype
import numpy as np


@dataclasses.dataclass
class DiscreteFactor:
    """phi(keys): table.shape == cards, axis order == keys order."""

    keys: Tuple[int, ...]
    cards: Tuple[int, ...]
    table: jnp.ndarray

    def value(self, assignment: Dict[int, int]) -> float:
        idx = tuple(assignment[k] for k in self.keys)
        return float(self.table[idx])

    def normalized(self) -> "DiscreteFactor":
        s = jnp.sum(self.table)
        return DiscreteFactor(self.keys, self.cards, self.table / s)


@dataclasses.dataclass
class DiscreteConditional:
    """P(frontal | parents): axes ordered (frontals..., parents...)."""

    frontals: Tuple[int, ...]
    parents: Tuple[int, ...]
    cards: Tuple[int, ...]        # frontal cards + parent cards
    table: jnp.ndarray

    @property
    def keys(self):
        return self.frontals + self.parents


def _align(f: DiscreteFactor, all_keys: Tuple[int, ...],
           all_cards: Tuple[int, ...]) -> jnp.ndarray:
    """Broadcast f.table into the axis order all_keys."""
    perm_src = [f.keys.index(k) for k in all_keys if k in f.keys]
    t = jnp.transpose(f.table, perm_src)
    shape = [c if k in f.keys else 1 for k, c in zip(all_keys, all_cards)]
    return t.reshape(shape)


def product(factors: Sequence[DiscreteFactor]) -> DiscreteFactor:
    all_keys: List[int] = []
    all_cards: List[int] = []
    for f in factors:
        for k, c in zip(f.keys, f.cards):
            if k not in all_keys:
                all_keys.append(k)
                all_cards.append(c)
    ak, ac = tuple(all_keys), tuple(all_cards)
    t = None
    for f in factors:
        a = _align(f, ak, ac)
        t = a if t is None else t * a
    return DiscreteFactor(ak, ac, jnp.broadcast_to(t, ac))


def _split_frontal(f: DiscreteFactor, key: int):
    """Move `key` to axis 0."""
    i = f.keys.index(key)
    order = (i,) + tuple(j for j in range(len(f.keys)) if j != i)
    t = jnp.transpose(f.table, order)
    keys = (key,) + tuple(k for k in f.keys if k != key)
    cards = (f.cards[i],) + tuple(c for j, c in enumerate(f.cards) if j != i)
    return keys, cards, t


def eliminate_sum(factors: Sequence[DiscreteFactor], key: int):
    """Sum-product single-variable elimination (EliminateDiscrete analog).

    Returns (DiscreteConditional P(key | rest), marginal DiscreteFactor(rest)).
    """
    joint = product([f for f in factors if key in f.keys])
    keys, cards, t = _split_frontal(joint, key)
    marg = jnp.sum(t, axis=0)
    cond_table = t / jnp.maximum(marg[None], 1e-300)
    cond = DiscreteConditional((key,), keys[1:], cards, cond_table)
    return cond, DiscreteFactor(keys[1:], cards[1:], marg)


def eliminate_max(factors: Sequence[DiscreteFactor], key: int):
    """Max-product elimination (EliminateForMPE analog).

    Returns (lookup table argmax_key(joint | rest), max-marginal factor).
    """
    joint = product([f for f in factors if key in f.keys])
    keys, cards, t = _split_frontal(joint, key)
    marg = jnp.max(t, axis=0)
    best = jnp.argmax(t, axis=0)
    lookup = DiscreteConditional((key,), keys[1:], cards, best)
    return lookup, DiscreteFactor(keys[1:], cards[1:], marg)


class DiscreteFactorGraph:
    def __init__(self, factors: Optional[List[DiscreteFactor]] = None):
        self.factors: List[DiscreteFactor] = list(factors or [])

    def add(self, keys, cards, table) -> "DiscreteFactorGraph":
        table = jnp.asarray(table, dtype=_default_dtype()).reshape(tuple(cards))
        self.factors.append(DiscreteFactor(tuple(keys), tuple(cards), table))
        return self

    def add_factor(self, f: DiscreteFactor) -> "DiscreteFactorGraph":
        self.factors.append(f)
        return self

    def keys(self):
        out: Dict[int, int] = {}
        for f in self.factors:
            for k, c in zip(f.keys, f.cards):
                out[k] = c
        return out

    def product(self) -> DiscreteFactor:
        return product(self.factors)

    def eliminate_sequential(self, ordering: Optional[Sequence[int]] = None
                             ) -> "DiscreteBayesNet":
        """Full sum-product elimination -> DiscreteBayesNet."""
        ordering = list(ordering if ordering is not None else self.keys())
        factors = list(self.factors)
        conditionals = []
        for key in ordering:
            involved = [f for f in factors if key in f.keys]
            if not involved:
                continue
            cond, marg = eliminate_sum(involved, key)
            conditionals.append(cond)
            factors = [f for f in factors if key not in f.keys]
            if marg.keys:
                factors.append(marg)
        return DiscreteBayesNet(conditionals)

    def optimize(self) -> Dict[int, int]:
        """MPE assignment via max-product + argmax back-substitution
        (DiscreteFactorGraph::optimize, DiscreteLookupDAG)."""
        ordering = list(self.keys())
        factors = list(self.factors)
        lookups = []
        for key in ordering:
            involved = [f for f in factors if key in f.keys]
            if not involved:
                continue
            lookup, marg = eliminate_max(involved, key)
            lookups.append(lookup)
            factors = [f for f in factors if key not in f.keys]
            if marg.keys:
                factors.append(marg)
        # back-substitute in reverse
        assignment: Dict[int, int] = {}
        for lk in reversed(lookups):
            idx = tuple(assignment[p] for p in lk.parents)
            assignment[lk.frontals[0]] = int(lk.table[idx])
        return assignment

    def marginals(self, key: int) -> jnp.ndarray:
        """Marginal P(key) by sum-product elimination of every other key
        (DiscreteMarginals analog).  Elimination — not a full joint product —
        so long chains / trees stay O(k^treewidth) instead of O(k^n)."""
        factors = list(self.factors)
        for other in self.keys():
            if other == key:
                continue
            involved = [f for f in factors if other in f.keys]
            if not involved:
                continue
            _, marg = eliminate_sum(involved, other)
            factors = [f for f in factors if other not in f.keys]
            if marg.keys:
                factors.append(marg)
        joint = product([f for f in factors if key in f.keys])
        keys, cards, t = _split_frontal(joint, key)
        m = jnp.sum(t.reshape(t.shape[0], -1), axis=1)
        return m / jnp.sum(m)


class DiscreteBayesNet:
    def __init__(self, conditionals: Optional[List[DiscreteConditional]] = None):
        self.conditionals: List[DiscreteConditional] = list(conditionals or [])

    def add(self, cond: DiscreteConditional) -> "DiscreteBayesNet":
        self.conditionals.append(cond)
        return self

    def evaluate(self, assignment: Dict[int, int]) -> float:
        p = 1.0
        for c in self.conditionals:
            idx = tuple(assignment[k] for k in c.keys)
            p *= float(c.table[idx])
        return p

    def sample(self, rng: np.random.Generator,
               given: Optional[Dict[int, int]] = None) -> Dict[int, int]:
        """Ancestral sampling (conditionals ordered child-first, like GTSAM)."""
        out = dict(given or {})
        for c in reversed(self.conditionals):
            if c.frontals[0] in out:
                continue
            idx = tuple(out[p] for p in c.parents)
            probs = np.asarray(c.table)[(slice(None),) + idx]
            probs = probs / probs.sum()
            out[c.frontals[0]] = int(rng.choice(len(probs), p=probs))
        return out

    def to_graph(self) -> DiscreteFactorGraph:
        g = DiscreteFactorGraph()
        for c in self.conditionals:
            g.add_factor(DiscreteFactor(c.keys, c.cards, c.table))
        return g


def from_signature(spec: str, keys: Dict[str, Tuple[int, int]]
                   ) -> DiscreteConditional:
    """Parse a Signature string, e.g. "A | B = 1/3 2/2" (Signature.h/.cpp).

    keys maps names -> (key_id, cardinality).  Rows are parent assignments in
    row-major order; each entry 'a/b/c' normalizes to a distribution.
    """
    lhs, rhs = spec.split("=")
    lhs = lhs.strip()
    if "|" in lhs:
        frontal_s, parents_s = lhs.split("|")
        parent_names = [p.strip() for p in re.split("[ ,]+", parents_s.strip())
                        if p.strip()]
    else:
        frontal_s, parent_names = lhs, []
    frontal = frontal_s.strip()
    fk, fc = keys[frontal]
    pks = [keys[p][0] for p in parent_names]
    pcs = [keys[p][1] for p in parent_names]
    rows = []
    for tok in rhs.strip().split():
        vals = np.asarray([float(x) for x in tok.split("/")])
        rows.append(vals / vals.sum())
    table = np.asarray(rows)  # (prod(parent cards), frontal card)
    n_rows = int(np.prod(pcs)) if pcs else 1
    assert table.shape == (n_rows, fc), f"signature shape mismatch: {spec}"
    # reorder to (frontal, parents...)
    t = table.T.reshape((fc,) + tuple(pcs))
    return DiscreteConditional((fk,), tuple(pks), (fc,) + tuple(pcs),
                               jnp.asarray(t))
