"""Translation averaging (1dsfm-style) and MFAS outlier ordering.

Reference: gtsam/sfm/TranslationRecovery.{h,cpp} (recover camera translations
from unit direction measurements), MFAS.{h,cpp} (minimum feedback arc set for
direction-outlier rejection), TranslationFactor.h, BinaryMeasurement.h.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..base import noise as noise_mod
from ..graph import factors as factors_mod
from ..graph.graph import FactorGraph
from ..graph.values import Values
from ..optimize import optimizers as opt_mod


def translation_factors(i_keys, j_keys, directions, sigma=0.01
                        ) -> factors_mod.FactorBatch:
    """TranslationFactor: residual = normalize(t_j - t_i) x / - w_ij.

    Reference TranslationFactor.h uses r = t_j - t_i - ||t_j - t_i|| * w_ij,
    which is smooth away from t_i == t_j; we mirror that."""
    dirs = np.asarray(directions, dtype=float)
    dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)

    def fn(xs, w):
        ti, tj = xs
        d = tj - ti
        return d - jnp.linalg.norm(d) * w

    keys = np.stack([np.asarray(i_keys), np.asarray(j_keys)], axis=1)
    return factors_mod.FactorBatch(
        "Translation", ("Point3", "Point3"), keys, 3, fn,
        jnp.asarray(dirs), noise_mod.isotropic(3, sigma))


def recover_translations(edges: Sequence[Tuple[int, int, np.ndarray]],
                         scale_edge: Optional[Tuple[int, int, float]] = None,
                         params: Optional[opt_mod.LMParams] = None
                         ) -> Dict[int, np.ndarray]:
    """TranslationRecovery::run: LM on translation factors with gauge anchors."""
    keys = sorted({k for e in edges for k in (e[0], e[1])})
    rng = np.random.default_rng(0)
    i_keys = [e[0] for e in edges]
    j_keys = [e[1] for e in edges]
    dirs = np.stack([e[2] for e in edges])
    g = FactorGraph()
    g.add(translation_factors(i_keys, j_keys, dirs))
    # gauge: anchor first translation at origin and fix scale
    g.add(factors_mod.prior_factors("Point3", [keys[0]], np.zeros((1, 3)),
                                    noise_mod.isotropic(3, 1e-4)))
    if scale_edge is None:
        i0, j0, s0 = edges[0][0], edges[0][1], 1.0
    else:
        i0, j0, s0 = scale_edge
    d0 = next(e[2] for e in edges if e[0] == i0 and e[1] == j0)
    d0 = d0 / np.linalg.norm(d0)
    g.add(factors_mod.prior_factors(
        "Point3", [j0], (s0 * d0)[None], noise_mod.isotropic(3, 1e-2)))
    entries = [(k, "Point3", rng.normal(size=3)) for k in keys]
    entries[0] = (keys[0], "Point3", np.zeros(3))
    init = Values.from_entries(entries)
    res = opt_mod.levenberg_marquardt(
        g, init, params or opt_mod.LMParams(max_iterations=100))
    return {k: np.asarray(res.values.at(k)) for k in keys}


def mfas_ordering(edges: Sequence[Tuple[int, int, float]],
                  nodes: Sequence[int]) -> List[int]:
    """Greedy minimum-feedback-arc-set ordering (MFAS.cpp computeOrdering):
    repeatedly pick the node maximizing (out-weight + 1) / (in-weight + 1)."""
    nodes = list(nodes)
    win: Dict[int, float] = {n: 0.0 for n in nodes}
    wout: Dict[int, float] = {n: 0.0 for n in nodes}
    out_edges: Dict[int, List[Tuple[int, float]]] = {n: [] for n in nodes}
    in_edges: Dict[int, List[Tuple[int, float]]] = {n: [] for n in nodes}
    for (i, j, w) in edges:
        w = abs(w)
        wout[i] += w
        win[j] += w
        out_edges[i].append((j, w))
        in_edges[j].append((i, w))
    order = []
    active = set(nodes)
    while active:
        best = max(active, key=lambda n: (wout[n] + 1.0) / (win[n] + 1.0))
        order.append(best)
        active.remove(best)
        for (j, w) in out_edges[best]:
            if j in active:
                win[j] -= w
        for (i, w) in in_edges[best]:
            if i in active:
                wout[i] -= w
    return order


def mfas_outlier_weights(edges: Sequence[Tuple[int, int, np.ndarray]],
                         directions_axis: np.ndarray) -> List[float]:
    """Project direction measurements on an axis; edges inconsistent with the
    MFAS ordering accrue outlier weight (MFAS::computeOutlierWeights)."""
    axis = np.asarray(directions_axis, dtype=float)
    axis = axis / np.linalg.norm(axis)
    proj = [(i, j, float(np.dot(e, axis))) for (i, j, e) in edges]
    nodes = sorted({k for (i, j, _e) in proj for k in (i, j)})
    # orient edges by projection sign
    oriented = [(i, j, w) if w >= 0 else (j, i, -w) for (i, j, w) in proj]
    order = mfas_ordering(oriented, nodes)
    pos = {n: p for p, n in enumerate(order)}
    out = []
    for (i, j, w) in oriented:
        out.append(0.0 if pos[i] < pos[j] else abs(w))
    return out
