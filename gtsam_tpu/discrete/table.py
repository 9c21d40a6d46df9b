"""Sparse discrete tables: the scalable complement to dense assignment arrays.

Reference: gtsam/discrete/TableFactor.h:46 (sparse table over assignments,
Eigen::SparseVector storage) and DecisionTree.h:62 (ADD compression via leaf
merging).  The reference compresses structured zeros/repeats with trees; the
TPU-native answer is an explicit sparse COO table — (codes, values) over the
factor's own domain — because elimination-time products/marginals then become
sorted joins and segment reductions (vectorized, no pointer chasing), and the
pruned hybrid smoother's surviving-mode sets are naturally sparse.

Everything here is host-side numpy by design: discrete elimination is
planning-scale work (the reference runs it single-threaded on CPU too); the
continuous TPU path consumes only the resulting mode assignments.
"""

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class TableFactor:
    """Sparse phi(keys): vals[i] at the assignment decoded from codes[i].

    codes are row-major flat indices over `cards` (axis order == keys order),
    sorted ascending and unique.  Entries absent from `codes` are ZERO.
    """

    keys: Tuple[int, ...]
    cards: Tuple[int, ...]
    codes: np.ndarray   # (n,) int64, sorted unique
    vals: np.ndarray    # (n,) float64

    @staticmethod
    def from_dense(keys, cards, table, tol: float = 0.0) -> "TableFactor":
        t = np.asarray(table, dtype=np.float64).reshape(-1)
        nz = np.flatnonzero(np.abs(t) > tol)
        return TableFactor(tuple(keys), tuple(cards), nz.astype(np.int64),
                           t[nz])

    @staticmethod
    def from_entries(keys, cards, assignments, vals) -> "TableFactor":
        """assignments: (n, k) per-key values in keys order."""
        keys, cards = tuple(keys), tuple(cards)
        a = np.asarray(assignments, dtype=np.int64).reshape(-1, len(keys))
        codes = np.zeros(len(a), dtype=np.int64)
        for i, c in enumerate(cards):
            codes = codes * c + a[:, i]
        order = np.argsort(codes, kind="stable")
        codes, vals = codes[order], np.asarray(vals, np.float64)[order]
        codes, inv = np.unique(codes, return_inverse=True)
        out = np.zeros(len(codes))
        np.add.at(out, inv, vals)
        return TableFactor(keys, cards, codes, out)

    @property
    def size(self) -> int:
        return len(self.codes)

    def dense(self) -> np.ndarray:
        t = np.zeros(int(np.prod(self.cards)))
        t[self.codes] = self.vals
        return t.reshape(self.cards)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(n,) flat codes -> (n, k) per-key assignment values."""
        out = np.empty((len(codes), len(self.keys)), dtype=np.int64)
        c = codes.copy()
        for i in range(len(self.keys) - 1, -1, -1):
            out[:, i] = c % self.cards[i]
            c //= self.cards[i]
        return out

    def value(self, assignment: Dict[int, int]) -> float:
        code = 0
        for k, c in zip(self.keys, self.cards):
            code = code * c + assignment[k]
        i = np.searchsorted(self.codes, code)
        if i < len(self.codes) and self.codes[i] == code:
            return float(self.vals[i])
        return 0.0

    def _subcodes(self, sub_keys: Sequence[int]) -> np.ndarray:
        """Flat codes over sub_keys (in the given order) for every entry."""
        a = self.decode(self.codes)
        pos = [self.keys.index(k) for k in sub_keys]
        out = np.zeros(self.size, dtype=np.int64)
        for p, k in zip(pos, sub_keys):
            out = out * self.cards[p] + a[:, p]
        return out

    def prune(self, max_entries: Optional[int] = None,
              tol: float = 0.0) -> "TableFactor":
        """Keep the largest entries (HybridBayesNet::prune analog)."""
        keep = np.abs(self.vals) > tol
        codes, vals = self.codes[keep], self.vals[keep]
        if max_entries is not None and len(vals) > max_entries:
            top = np.argsort(np.abs(vals))[-max_entries:]
            top.sort()
            codes, vals = codes[top], vals[top]
        return TableFactor(self.keys, self.cards, codes, vals)

    def normalized(self) -> "TableFactor":
        s = self.vals.sum()
        return TableFactor(self.keys, self.cards, self.codes, self.vals / s)


def table_product(f: TableFactor, g: TableFactor) -> TableFactor:
    """Sparse join on shared keys (zero * anything = zero drops out)."""
    shared = [k for k in f.keys if k in g.keys]
    new_keys = list(f.keys) + [k for k in g.keys if k not in f.keys]
    cards_map = dict(zip(f.keys, f.cards))
    cards_map.update(dict(zip(g.keys, g.cards)))
    new_cards = [cards_map[k] for k in new_keys]

    fs = f._subcodes(shared) if shared else np.zeros(f.size, np.int64)
    gs = g._subcodes(shared) if shared else np.zeros(g.size, np.int64)
    g_order = np.argsort(gs, kind="stable")
    gs_sorted = gs[g_order]
    lo = np.searchsorted(gs_sorted, fs, side="left")
    hi = np.searchsorted(gs_sorted, fs, side="right")
    counts = hi - lo
    fi = np.repeat(np.arange(f.size), counts)
    # offset of each output row within its f-entry's matching g-run
    total = int(counts.sum())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offset = np.arange(total) - np.repeat(starts, counts)
    gi = g_order[np.repeat(lo, counts) + offset]

    vals = f.vals[fi] * g.vals[gi]
    fa = f.decode(f.codes)[fi]                      # (m, kf)
    ga = g.decode(g.codes)[gi]                      # (m, kg)
    cols = []
    for k in new_keys:
        if k in f.keys:
            cols.append(fa[:, f.keys.index(k)])
        else:
            cols.append(ga[:, g.keys.index(k)])
    assignments = np.stack(cols, axis=1) if new_keys else \
        np.zeros((len(vals), 0), np.int64)
    return TableFactor.from_entries(new_keys, new_cards, assignments, vals)


def table_marginalize(f: TableFactor, key: int, op: str = "sum"):
    """Remove `key` by sum or max.  Returns (result, argmax TableFactor|None).

    For op == 'max' the second value maps each surviving rest-assignment to
    the maximizing value of `key` (DiscreteLookupDAG analog).
    """
    rest = [k for k in f.keys if k != key]
    rest_cards = [f.cards[f.keys.index(k)] for k in rest]
    rc = f._subcodes(rest) if rest else np.zeros(f.size, np.int64)
    kvals = f.decode(f.codes)[:, f.keys.index(key)]
    ucodes, inv = np.unique(rc, return_inverse=True)
    if op == "sum":
        out = np.zeros(len(ucodes))
        np.add.at(out, inv, f.vals)
        arg = None
    else:
        out = np.full(len(ucodes), -np.inf)
        np.maximum.at(out, inv, f.vals)
        best = np.zeros(len(ucodes), dtype=np.int64)
        hit = f.vals >= out[inv] - 1e-300
        best[inv[hit]] = kvals[hit]
        arg = TableFactor(tuple(rest), tuple(rest_cards), ucodes,
                          best.astype(np.float64))
    res = TableFactor(tuple(rest), tuple(rest_cards), ucodes, out)
    return res, arg


@dataclasses.dataclass
class TableConditional:
    """Sparse P(frontal | parents): entries grouped by parent assignment."""

    frontal: int
    parents: Tuple[int, ...]
    table: TableFactor           # keys = (frontal,) + parents

    def sample_given(self, rng, parent_assignment: Dict[int, int]) -> int:
        pa = self.table._subcodes(self.parents) if self.parents else \
            np.zeros(self.table.size, np.int64)
        code = 0
        for k in self.parents:
            code = code * self.table.cards[self.table.keys.index(k)] \
                + parent_assignment[k]
        sel = pa == code
        fvals = self.table.decode(self.table.codes)[sel, 0]
        p = self.table.vals[sel]
        p = p / p.sum()
        return int(rng.choice(fvals, p=p))


def table_eliminate_sum(factors: Sequence[TableFactor], key: int):
    """Sum-product elimination step on sparse tables (EliminateDiscrete)."""
    joint = factors[0]
    for g in factors[1:]:
        joint = table_product(joint, g)
    marg, _ = table_marginalize(joint, key, "sum")
    # conditional: joint / marg on matching rest-codes
    rest = [k for k in joint.keys if k != key]
    rc = joint._subcodes(rest) if rest else np.zeros(joint.size, np.int64)
    i = np.searchsorted(marg.codes, rc)
    denom = np.maximum(marg.vals[i], 1e-300)
    # reorder keys to (frontal, parents...)
    fa = joint.decode(joint.codes)
    kpos = joint.keys.index(key)
    order = [kpos] + [j for j in range(len(joint.keys)) if j != kpos]
    ckeys = [joint.keys[j] for j in order]
    ccards = [joint.cards[j] for j in order]
    cond_tab = TableFactor.from_entries(ckeys, ccards, fa[:, order],
                                        joint.vals / denom)
    cond = TableConditional(key, tuple(rest), cond_tab)
    return cond, marg


def table_eliminate_max(factors: Sequence[TableFactor], key: int):
    """Max-product elimination step (EliminateForMPE)."""
    joint = factors[0]
    for g in factors[1:]:
        joint = table_product(joint, g)
    marg, arg = table_marginalize(joint, key, "max")
    return arg, marg


class SparseDiscreteFactorGraph:
    """Discrete factor graph on sparse tables (dozens+ of variables)."""

    def __init__(self, factors: Optional[List[TableFactor]] = None):
        self.factors: List[TableFactor] = list(factors or [])

    def add(self, keys, cards, table, tol: float = 0.0):
        self.factors.append(TableFactor.from_dense(keys, cards, table, tol))
        return self

    def add_factor(self, f: TableFactor):
        self.factors.append(f)
        return self

    def keys(self) -> Dict[int, int]:
        out: Dict[int, int] = {}
        for f in self.factors:
            for k, c in zip(f.keys, f.cards):
                out[k] = c
        return out

    def _elimination_order(self, ordering):
        if ordering is not None:
            return list(ordering)
        # min-degree over the interaction graph (host-side, cheap)
        keys = list(self.keys())
        adj = {k: set() for k in keys}
        for f in self.factors:
            for a in f.keys:
                adj[a].update(k for k in f.keys if k != a)
        order = []
        active = set(keys)
        while active:
            k = min(active, key=lambda x: len(adj[x] & active))
            order.append(k)
            nbrs = adj[k] & active
            for a in nbrs:
                adj[a].update(nbrs - {a})
            active.remove(k)
        return order

    def eliminate_sequential(self, ordering=None) -> List[TableConditional]:
        order = self._elimination_order(ordering)
        factors = list(self.factors)
        conditionals = []
        for key in order:
            involved = [f for f in factors if key in f.keys]
            if not involved:
                continue
            cond, marg = table_eliminate_sum(involved, key)
            conditionals.append(cond)
            factors = [f for f in factors if key not in f.keys]
            if marg.keys:
                factors.append(marg)
        return conditionals

    def optimize(self, ordering=None) -> Dict[int, int]:
        """MPE via sparse max-product + argmax back-pass."""
        order = self._elimination_order(ordering)
        factors = list(self.factors)
        lookups = []
        for key in order:
            involved = [f for f in factors if key in f.keys]
            if not involved:
                continue
            arg, marg = table_eliminate_max(involved, key)
            lookups.append((key, arg))
            factors = [f for f in factors if key not in f.keys]
            if marg.keys:
                factors.append(marg)
        assignment: Dict[int, int] = {}
        for key, arg in reversed(lookups):
            if arg.size == 0:
                assignment[key] = 0
                continue
            code = 0
            for k, c in zip(arg.keys, arg.cards):
                code = code * c + assignment[k]
            i = int(np.searchsorted(arg.codes, code))
            if i < arg.size and arg.codes[i] == code:
                assignment[key] = int(arg.vals[i])
            else:
                assignment[key] = 0
        return assignment

    def marginal(self, key: int, ordering=None) -> np.ndarray:
        """P(key) by eliminating everything else."""
        order = [k for k in self._elimination_order(ordering) if k != key]
        factors = list(self.factors)
        for k in order:
            involved = [f for f in factors if k in f.keys]
            if not involved:
                continue
            _, marg = table_eliminate_sum(involved, k)
            factors = [f for f in factors if k not in f.keys]
            if marg.keys:
                factors.append(marg)
        joint = factors[0]
        for g in factors[1:]:
            joint = table_product(joint, g)
        card = self.keys()[key]
        dense = np.zeros(card)
        a = joint.decode(joint.codes)[:, joint.keys.index(key)]
        np.add.at(dense, a, joint.vals)
        return dense / dense.sum()
