"""Values: typed, batched variable storage.

The reference Values is a type-erased Key->unique_ptr<Value> map
(gtsam/nonlinear/Values.h:65-79) with per-key virtual retract.  The TPU-native
design replaces it with struct-of-arrays: ONE stacked pytree per manifold type,
so retract is a handful of vmapped Expmaps (one fused XLA kernel per type)
instead of a million virtual calls.  Keys are host-side metadata.
"""

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import manifolds


@dataclasses.dataclass(frozen=True)
class Layout:
    """Canonical tangent-vector layout: types in sorted order, rows in order."""

    total_dim: int
    offsets: Dict[str, np.ndarray]     # type -> (N_t,) start offset of each row
    type_order: tuple


class Values:
    """arrays: type -> batched pytree (leading dim N_t); keys: type -> (N_t,) int64."""

    def __init__(self, arrays: Dict[str, Any], keys: Dict[str, np.ndarray]):
        self.arrays = arrays
        self.keys = {t: np.asarray(k, dtype=np.int64) for t, k in keys.items()}
        self._index: Dict[int, tuple] = {}
        for t, ks in self.keys.items():
            for row, k in enumerate(ks):
                self._index[int(k)] = (t, row)
        self._layout = None

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_entries(entries):
        """entries: iterable of (key, type_name, element_pytree)."""
        per_type: Dict[str, list] = {}
        keys: Dict[str, list] = {}
        for key, tname, val in entries:
            per_type.setdefault(tname, []).append(val)
            keys.setdefault(tname, []).append(key)
        arrays = {
            t: jax.tree.map(lambda *xs: jnp.stack(xs), *vals)
            for t, vals in per_type.items()
        }
        return Values(arrays, {t: np.asarray(k) for t, k in keys.items()})

    def astype(self, dtype) -> "Values":
        """Values with all floating leaves cast to `dtype` (keys untouched).

        TPU precision policy helper: run the solver core in f32 while x64
        stays enabled for f64 accumulation/refinement (SURVEY.md §7)."""
        def cast(a):
            a = jnp.asarray(a)
            return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) \
                else a
        return self.replace_arrays(jax.tree.map(cast, self.arrays))

    def replace_arrays(self, arrays) -> "Values":
        out = Values.__new__(Values)
        out.arrays = arrays
        out.keys = self.keys
        out._index = self._index
        out._layout = self._layout
        return out

    def subset(self, keys) -> "Values":
        """Values restricted to `keys` (Values::extract analog, Values.h)."""
        want = {int(k) for k in keys}
        arrays: Dict[str, Any] = {}
        out_keys: Dict[str, np.ndarray] = {}
        for t, ks in self.keys.items():
            rows = np.asarray([i for i, k in enumerate(ks)
                               if int(k) in want], dtype=np.int32)
            if len(rows):
                arrays[t] = jax.tree.map(lambda a: a[rows], self.arrays[t])
                out_keys[t] = ks[rows]
        return Values(arrays, out_keys)

    # -- lookup ------------------------------------------------------------

    def __len__(self):
        return len(self._index)

    def __contains__(self, key):
        return int(key) in self._index

    def type_of(self, key) -> str:
        return self._index[int(key)][0]

    def row_of(self, key) -> int:
        return self._index[int(key)][1]

    def rows_of(self, tname: str, keys) -> np.ndarray:
        """Vectorized key->row lookup for one type."""
        idx = self._index
        return np.asarray([idx[int(k)][1] for k in keys], dtype=np.int32)

    def at(self, key):
        t, row = self._index[int(key)]
        return jax.tree.map(lambda a: a[row], self.arrays[t])

    def get_rows(self, tname: str, rows):
        return jax.tree.map(lambda a: a[rows], self.arrays[tname])

    # -- tangent layout ----------------------------------------------------

    def layout(self) -> Layout:
        if self._layout is None:
            order = tuple(sorted(self.keys))
            offsets = {}
            base = 0
            for t in order:
                d = manifolds.get(t).dim
                n = len(self.keys[t])
                offsets[t] = (base + np.arange(n, dtype=np.int32) * d)
                base += n * d
            self._layout = Layout(base, offsets, order)
        return self._layout

    # -- manifold ops ------------------------------------------------------

    def retract(self, delta: jnp.ndarray) -> "Values":
        """delta: flat (total_dim,) tangent vector in canonical layout."""
        return self.replace_arrays(retract_arrays(self.arrays, delta, self.layout()))

    def local(self, other: "Values") -> jnp.ndarray:
        lay = self.layout()
        out = jnp.zeros(lay.total_dim, dtype=jax.tree.leaves(self.arrays)[0].dtype)
        for t in lay.type_order:
            m = manifolds.get(t)
            d = vmapped_local(m)(self.arrays[t], other.arrays[t])
            idx = lay.offsets[t][:, None] + np.arange(m.dim)[None, :]
            out = out.at[idx.reshape(-1)].set(d.reshape(-1))
        return out


def vmapped_retract(m: manifolds.ManifoldType):
    return jax.vmap(m.retract)


def vmapped_local(m: manifolds.ManifoldType):
    return jax.vmap(m.local)


def retract_arrays(arrays, delta, layout: Layout):
    """Pure function (jit-friendly): retract stacked arrays by flat delta."""
    new = {}
    for t in layout.type_order:
        m = manifolds.get(t)
        idx = layout.offsets[t][:, None] + np.arange(m.dim, dtype=np.int32)[None, :]
        dt = delta[idx]
        new[t] = vmapped_retract(m)(arrays[t], dt)
    return new


