"""Runtime-keyed debug switches (the SETDEBUG/ISDEBUG analog).

Reference: gtsam/base/debug.{h,cpp} — a global string-keyed flag map that
solver internals consult to emit targeted traces (e.g.
SETDEBUG("ISAM2 recalculate", true), consulted at ISAM2.cpp:255).  Here the
registry is a plain module-level dict; flags can also be seeded from the
environment (GTSAM_TPU_DEBUG="ISAM2 recalculate,schur").  Host-side only —
flags are read at trace time, so toggling a flag takes effect on the next
(re)trace, never inside a compiled computation.
"""

import os
from typing import Dict

_flags: Dict[str, bool] = {}

for _k in os.environ.get("GTSAM_TPU_DEBUG", "").split(","):
    _k = _k.strip()
    if _k:
        _flags[_k] = True


def set_debug(key: str, value: bool = True) -> None:
    """SETDEBUG analog: enable/disable a named debug switch."""
    _flags[key] = bool(value)


def is_debug(key: str) -> bool:
    """ISDEBUG analog: cheap lookup, False for unknown keys."""
    return _flags.get(key, False)


def debug_print(key: str, *args) -> None:
    """Print only when the named switch is on (host-side)."""
    if is_debug(key):
        print(f"[{key}]", *args, flush=True)


def clear() -> None:
    _flags.clear()
