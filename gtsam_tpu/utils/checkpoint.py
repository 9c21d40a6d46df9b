"""Checkpoint / resume: pytree serialization of Values, deltas, optimizer state.

Reference analog: boost::serialization over every type (SURVEY.md §5.4);
here a single orbax-style npz checkpoint of the (arrays, keys) pytrees —
graph structure is code + measurement arrays, which serialize the same way.
"""

import json
import os
from typing import Any, Dict

import jax
import numpy as np

from ..graph.values import Values


def _flatten(prefix: str, tree, out: Dict[str, np.ndarray]):
    leaves, treedef = jax.tree.flatten(tree)
    out[f"__treedef__{prefix}"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}__{i}"] = np.asarray(leaf)


def save_values(path: str, values: Values, extra: Dict[str, Any] = None) -> None:
    arrays: Dict[str, np.ndarray] = {}
    meta = {"types": sorted(values.arrays)}
    for t in meta["types"]:
        _flatten(f"arr_{t}", values.arrays[t], arrays)
        arrays[f"keys_{t}"] = values.keys[t]
    if extra:
        for k, v in extra.items():
            arrays[f"extra_{k}"] = np.asarray(v)
            meta.setdefault("extra", []).append(k)
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_values(path: str):
    """Returns (Values, extra dict)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode())
    arrays, keys = {}, {}
    for t in meta["types"]:
        leaves = []
        i = 0
        while f"arr_{t}__{i}" in data:
            leaves.append(data[f"arr_{t}__{i}"])
            i += 1
        if len(leaves) == 1:
            arrays[t] = leaves[0]
        else:
            # NamedTuple pytrees (SE3, BalCamera...) reassemble by import
            from ..geometry.se3 import SE3
            from ..geometry.cameras import BalCamera
            if len(leaves) == 2:
                arrays[t] = SE3(*leaves)
            elif len(leaves) == 3 and t == "BalCamera":
                arrays[t] = BalCamera(SE3(leaves[0], leaves[1]), leaves[2])
            else:
                arrays[t] = tuple(leaves)
        keys[t] = data[f"keys_{t}"]
    extra = {k: data[f"extra_{k}"] for k in meta.get("extra", [])}
    return Values(arrays, keys), extra
