"""NonlinearISAM: the ISAM1-style wrapper — periodic full reorder/relinearize
around an otherwise linear incremental update (gtsam/nonlinear/
NonlinearISAM.{h,cpp}).

Between reorder points the linearization point is FROZEN: new factors are
linearized at the current estimate and folded into the running linear system;
every `reorder_interval` updates the whole graph is relinearized from scratch
(the reference calls ISAM::update in between and reorder_relinearize()
periodically).  On TPU the "linear fold-in" is simply a batch solve over the
accumulated graph at the frozen linearization point — the expensive part
(factorization) reuses the cached jitted solver until structure changes.
"""

from typing import Optional, Sequence, Tuple

import numpy as np

from ..graph import factors as factors_mod
from ..graph.graph import FactorGraph
from ..graph.values import Values
from .isam2 import ISAM2, ISAM2Params


class NonlinearISAM:
    """Periodic-relinearization incremental estimator (NonlinearISAM.h:30)."""

    def __init__(self, reorder_interval: int = 1):
        self.reorder_interval = max(1, int(reorder_interval))
        # relinearize ONLY when forced (periodic or explicit): threshold 0 =>
        # full relinearization when it happens; skip huge => never spontaneous
        self._isam = ISAM2(ISAM2Params(relinearize_threshold=0.0,
                                       relinearize_skip=1_000_000_000,
                                       evaluate_nonlinear_error=False))
        self.reorder_counter = 0

    @property
    def graph(self) -> FactorGraph:
        return self._isam.graph

    def update(self, new_batches: Sequence[factors_mod.FactorBatch] = (),
               new_entries: Sequence[Tuple] = ()):
        """Add factors/values; relinearize fully every reorder_interval
        updates (NonlinearISAM::update + reorderRelinearize)."""
        self.reorder_counter += 1
        force = (self.reorder_counter % self.reorder_interval) == 0
        return self._isam.update(new_batches, new_entries,
                                 force_relinearize=force)

    def reorder_relinearize(self):
        """Force a full relinearization at the current estimate."""
        return self._isam.update((), (), force_relinearize=True)

    def estimate(self) -> Values:
        return self._isam.calculate_estimate()

    def marginal_covariance(self, key):
        return self._isam.marginal_covariance(key)
