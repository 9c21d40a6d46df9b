"""Native (C) runtime components, loaded via ctypes with graceful fallback.

Build happens lazily on first import (gcc -O3 -shared); set
GTSAM_TPU_NO_NATIVE=1 to force the pure-Python paths.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libgtsam_native.so")
_SRC = os.path.join(_HERE, "src", "symbolic.c")
_SRC_AMD = os.path.join(_HERE, "src", "amd.c")
_SRC_ND = os.path.join(_HERE, "src", "nd.c")

_lib = None


def _build():
    cmd = ["gcc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, _SRC_AMD, _SRC_ND]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("GTSAM_TPU_NO_NATIVE"):
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC_AMD)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC_ND)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.symbolic_analyze.restype = ctypes.c_int64
        lib.count_triples.restype = ctypes.c_int64
        lib.emit_triples.restype = ctypes.c_int64
        lib.amd_order.restype = ctypes.c_int32
        lib.nd_order.restype = ctypes.c_int32
        lib.nd_bisect.restype = ctypes.c_int32
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def symbolic_analyze_native(n, nbr_indptr, nbr):
    """Returns (parent, level, struct_indptr, struct_rows) or None."""
    lib = get_lib()
    if lib is None:
        return None
    nbr_indptr = np.ascontiguousarray(nbr_indptr, dtype=np.int64)
    nbr = np.ascontiguousarray(nbr, dtype=np.int32)
    parent = np.empty(n, dtype=np.int32)
    level = np.empty(n, dtype=np.int32)
    struct_indptr = np.empty(n + 1, dtype=np.int64)
    cap = max(len(nbr) * 8 + 1024, 1 << 16)
    for _ in range(6):  # grow until it fits
        struct_rows = np.empty(cap, dtype=np.int32)
        total = lib.symbolic_analyze(
            ctypes.c_int32(n), _ptr(nbr_indptr, ctypes.c_int64),
            _ptr(nbr, ctypes.c_int32), _ptr(parent, ctypes.c_int32),
            _ptr(level, ctypes.c_int32), _ptr(struct_indptr, ctypes.c_int64),
            _ptr(struct_rows, ctypes.c_int32), ctypes.c_int64(cap))
        if total >= 0:
            return parent, level, struct_indptr, struct_rows[:total]
        cap *= 4
    return None


def emit_triples_native(n, struct_indptr, struct_rows, sub_base, dblock,
                        level_of_col):
    lib = get_lib()
    if lib is None:
        return None
    total = lib.count_triples(ctypes.c_int32(n),
                              _ptr(np.ascontiguousarray(struct_indptr,
                                                        dtype=np.int64),
                                   ctypes.c_int64))
    struct_indptr = np.ascontiguousarray(struct_indptr, dtype=np.int64)
    struct_rows = np.ascontiguousarray(struct_rows, dtype=np.int32)
    sub_base = np.ascontiguousarray(sub_base, dtype=np.int64)
    dblock = np.ascontiguousarray(dblock, dtype=np.int32)
    level_of_col = np.ascontiguousarray(level_of_col, dtype=np.int32)
    t_target = np.empty(total, dtype=np.int32)
    t_ik = np.empty(total, dtype=np.int32)
    t_jk = np.empty(total, dtype=np.int32)
    t_level = np.empty(total, dtype=np.int32)
    lib.emit_triples(
        ctypes.c_int32(n), _ptr(struct_indptr, ctypes.c_int64),
        _ptr(struct_rows, ctypes.c_int32), _ptr(sub_base, ctypes.c_int64),
        _ptr(dblock, ctypes.c_int32), _ptr(t_target, ctypes.c_int32),
        _ptr(t_ik, ctypes.c_int32), _ptr(t_jk, ctypes.c_int32),
        _ptr(t_level, ctypes.c_int32), _ptr(level_of_col, ctypes.c_int32))
    return t_target, t_ik, t_jk, t_level


def amd_order_native(n, indptr, indices, constrained_last=None):
    """AMD fill-reducing ordering (native C); returns perm or None.

    constrained_last: optional bool mask — True entries are ordered last
    (reference ColamdConstrainedLast, gtsam/inference/Ordering.h:112)."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    perm = np.empty(n, dtype=np.int32)
    if constrained_last is not None:
        cmask = np.ascontiguousarray(constrained_last, dtype=np.uint8)
        cptr = _ptr(cmask, ctypes.c_uint8)
    else:
        cptr = None
    rc = lib.amd_order(ctypes.c_int32(n), _ptr(indptr, ctypes.c_int64),
                       _ptr(indices, ctypes.c_int32),
                       _ptr(perm, ctypes.c_int32), cptr)
    if rc != 0:
        return None
    return perm.astype(np.int64)


def nd_order_native(n, indptr, indices, leaf_size=32):
    """Multilevel nested dissection (native C, METIS-class); perm or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    perm = np.empty(n, dtype=np.int32)
    rc = lib.nd_order(ctypes.c_int32(n), _ptr(indptr, ctypes.c_int64),
                      _ptr(indices, ctypes.c_int32),
                      _ptr(perm, ctypes.c_int32), ctypes.c_int32(leaf_size))
    if rc != 0:
        return None
    return perm.astype(np.int64)


def nd_bisect_native(n, indptr, indices):
    """Balanced vertex bisection; part[i] in {0,1,2=separator} or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    part = np.empty(n, dtype=np.int32)
    rc = lib.nd_bisect(ctypes.c_int32(n), _ptr(indptr, ctypes.c_int64),
                       _ptr(indices, ctypes.c_int32),
                       _ptr(part, ctypes.c_int32))
    if rc != 0:
        return None
    return part
