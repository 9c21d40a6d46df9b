"""Hierarchical scoped timing (the gttic/gttoc analog).

Reference: gtsam/base/timing.{h,cpp} — RAII label tree with per-node wall
stats, printed as an indented outline.  Device work is bracketed with
jax.profiler trace annotations when available; block_until_ready is the
caller's responsibility for accurate wall times (JAX dispatch is async).
"""

import contextlib
import time
from typing import Dict, Optional

import jax


class _Node:
    __slots__ = ("name", "total", "count", "children", "t_min", "t_max")

    def __init__(self, name):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.t_min = float("inf")
        self.t_max = 0.0
        self.children: Dict[str, "_Node"] = {}

    def record(self, dt):
        self.total += dt
        self.count += 1
        self.t_min = min(self.t_min, dt)
        self.t_max = max(self.t_max, dt)


_root = _Node("root")
_stack = [_root]


@contextlib.contextmanager
def tic(label: str):
    """with timing.tic("linearize"): ...  — nests like gttic/gttoc."""
    parent = _stack[-1]
    node = parent.children.setdefault(label, _Node(label))
    _stack.append(node)
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(label):
            yield
    finally:
        node.record(time.perf_counter() - t0)
        _stack.pop()


def reset():
    global _root, _stack
    _root = _Node("root")
    _stack = [_root]


def print_report(node: Optional[_Node] = None, indent: int = 0, out=None):
    """tictoc_print_ analog."""
    import sys
    out = out or sys.stdout
    node = node or _root
    if node is not _root:
        avg = node.total / max(node.count, 1)
        out.write("  " * indent +
                  f"{node.name}: {node.total:.4f}s ({node.count} calls, "
                  f"avg {avg:.4f}s, min {node.t_min:.4f}s, max {node.t_max:.4f}s)\n")
    for c in node.children.values():
        print_report(c, indent + (0 if node is _root else 1), out)


def report_dict(node: Optional[_Node] = None):
    node = node or _root
    return {
        name: {"total": c.total, "count": c.count,
               "children": report_dict(c)}
        for name, c in node.children.items()
    }
