"""Concurrent filtering and smoothing: a fast filter over the recent window and
a slower smoother over the past, exchanging summarized marginal factors on
synchronize().

Reference: gtsam_unstable/nonlinear/ConcurrentFilteringAndSmoothing.h:34
(ConcurrentBatchFilter/Smoother) — the two-rate asynchronous estimation
template (SURVEY.md §2.8 P6).
"""

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..graph import factors as factors_mod
from ..graph.graph import FactorGraph
from ..graph.values import Values
from ..optimize import optimizers as opt_mod
from .fixed_lag import marginalize


@dataclasses.dataclass
class ConcurrentParams:
    filter_lag: float = 2.0
    lm: Optional[opt_mod.LMParams] = None


class ConcurrentFilter:
    """Fast estimator over the recent window; hands off old states at sync."""

    def __init__(self, params: Optional[ConcurrentParams] = None):
        self.params = params or ConcurrentParams()
        self.graph = FactorGraph()
        self.values: Optional[Values] = None
        self.timestamps: Dict[int, float] = {}
        self._outbox_batches: List[factors_mod.FactorBatch] = []
        self._outbox_entries: List = []
        self._smoother_summary: Optional[factors_mod.FactorBatch] = None

    def update(self, new_batches=(), new_entries=(), new_timestamps=None):
        for b in new_batches:
            self.graph.add(b)
        if new_entries:
            self.values = _merge_values(self.values, Values.from_entries(new_entries))
        self.timestamps.update(new_timestamps or {})
        g = FactorGraph(list(self.graph.batches)
                        + ([self._smoother_summary] if self._smoother_summary else []))
        res = opt_mod.levenberg_marquardt(
            g, self.values, self.params.lm or opt_mod.LMParams(max_iterations=10))
        self.values = res.values
        return res

    def synchronize(self, smoother: "ConcurrentSmoother"):
        """Move out-of-lag states + their factors to the smoother; receive its
        summarized prior on the separator (the reference's synchronize())."""
        if not self.timestamps:
            return
        tmax = max(self.timestamps.values())
        old = [k for k, ts in self.timestamps.items()
               if ts < tmax - self.params.filter_lag]
        if not old:
            return
        old_set = set(old)
        move, keep = [], []
        for b in self.graph.batches:
            (move if any(int(k) in old_set for k in b.keys.reshape(-1))
             else keep).append(b)
        move_entries = [(k, self.values.type_of(k), self.values.at(k))
                        for k in old]
        # boundary keys stay in both
        boundary = sorted({int(k) for b in move for k in b.keys.reshape(-1)
                           if int(k) not in old_set})
        boundary_entries = [(k, self.values.type_of(k), self.values.at(k))
                            for k in boundary if k in self.values]
        smoother.absorb(move, move_entries + boundary_entries)
        # filter keeps a marginalized version
        self.graph = marginalize(FactorGraph(self.graph.batches),
                                 self.values, old)
        self._drop_values(old)
        for k in old:
            del self.timestamps[k]
        # summary must live on the separator = keys in BOTH estimators
        sep = [k for k in boundary if k in self.values]
        self._smoother_summary = smoother.summarize(sep)

    def _drop_values(self, keys):
        drop = set(int(k) for k in keys)
        arrays, kept = {}, {}
        import jax
        for t, ks in self.values.keys.items():
            mask = np.asarray([int(k) not in drop for k in ks])
            if mask.any():
                arrays[t] = jax.tree.map(lambda a: a[np.where(mask)[0]],
                                         self.values.arrays[t])
                kept[t] = ks[mask]
        self.values = Values(arrays, kept)


class ConcurrentSmoother:
    """Slow full smoother over handed-off history."""

    def __init__(self, params: Optional[ConcurrentParams] = None):
        self.params = params or ConcurrentParams()
        self.graph = FactorGraph()
        self.values: Optional[Values] = None
        self._latest_keys: List[int] = []

    def absorb(self, batches, entries):
        for b in batches:
            self.graph.add(b)
        if entries:
            self.values = _merge_values(self.values, Values.from_entries(
                [(k, t, v) for (k, t, v) in entries
                 if self.values is None or k not in self.values]))
        self._latest_keys = sorted({int(k) for b in batches
                                    for k in b.keys.reshape(-1)})

    def update(self):
        if self.values is None or not self.graph.batches:
            return None
        res = opt_mod.levenberg_marquardt(
            self.graph, self.values,
            self.params.lm or opt_mod.LMParams(max_iterations=25))
        self.values = res.values
        return res

    def summarize(self, separator=None) -> Optional[factors_mod.FactorBatch]:
        """Summarized marginal factor on the separator keys (shared with the
        filter)."""
        if self.values is None or not self.graph.batches:
            return None
        if separator is None:
            separator = [k for k in self._latest_keys if k in self.values][-2:]
        sep = [k for k in separator if k in self.values]
        if not sep:
            return None
        others = [int(k) for t, ks in self.values.keys.items() for k in ks
                  if int(k) not in sep]
        if not others:
            return None
        g2 = marginalize(self.graph, self.values, others)
        # the marginalized graph's LinearContainer on sep IS the summary
        for b in g2.batches:
            if b.name == "LinearContainer":
                return b
        return None


def _merge_values(a: Optional[Values], b: Values) -> Values:
    if a is None:
        return b
    import jax
    import jax.numpy as jnp
    arrays, keys = {}, {}
    for t in sorted(set(a.arrays) | set(b.arrays)):
        if t in a.arrays and t in b.arrays:
            arrays[t] = jax.tree.map(lambda x, y: jnp.concatenate([x, y]),
                                     a.arrays[t], b.arrays[t])
            keys[t] = np.concatenate([a.keys[t], b.keys[t]])
        elif t in a.arrays:
            arrays[t], keys[t] = a.arrays[t], a.keys[t]
        else:
            arrays[t], keys[t] = b.arrays[t], b.keys[t]
    return Values(arrays, keys)
