"""ctypes loader for the native host core (builds lazily with g++).

The native library provides the classic sequential-greedy setup algorithms
(standard aggregation, Ruge-Stuben splitting) whose coarse-grid quality the
reference test thresholds assume.  All device compute stays in JAX/XLA;
this is host-side setup logic only (the analogue of the reference's
pybind11 amg_core, re-architected as a tiny C ABI).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "amg_host.cpp")
_LIB = os.path.join(_DIR, "libamg_host.so")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    try:
        if (not os.path.exists(_LIB) or
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.standard_aggregation.restype = ctypes.c_int32
        lib.standard_aggregation.argtypes = [ctypes.c_int32, i32p, i32p,
                                             i32p, i32p]
        lib.naive_aggregation.restype = ctypes.c_int32
        lib.naive_aggregation.argtypes = [ctypes.c_int32, i32p, i32p,
                                          i32p, i32p]
        lib.rs_cf_splitting.restype = None
        lib.rs_cf_splitting.argtypes = [ctypes.c_int32, i32p, i32p, i32p,
                                        i32p, i32p, i32p]
        lib.rs_cf_splitting_pass2.restype = None
        lib.rs_cf_splitting_pass2.argtypes = [ctypes.c_int32, i32p, i32p,
                                              i32p]
        lib.first_fit_coloring.restype = ctypes.c_int32
        lib.first_fit_coloring.argtypes = [ctypes.c_int32, i32p, i32p,
                                           i32p]
        _lib = lib
    except Exception as e:  # pragma: no cover - fallback path
        warnings.warn(f"native amg_host unavailable ({e}); "
                      "falling back to parallel device algorithms")
        _lib = None
    return _lib


def _i32(a):
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def standard_aggregation(n, indptr, indices):
    """Greedy 3-pass aggregation. Returns (labels, cpts) or None."""
    lib = get_lib()
    if lib is None:
        return None
    Sp, Sj = _i32(indptr), _i32(indices)
    labels = np.empty(n, np.int32)
    cpts = np.empty(max(n, 1), np.int32)
    nagg = lib.standard_aggregation(n, _ptr(Sp), _ptr(Sj), _ptr(labels),
                                    _ptr(cpts))
    return labels, cpts[:nagg]


def naive_aggregation(n, indptr, indices):
    lib = get_lib()
    if lib is None:
        return None
    Sp, Sj = _i32(indptr), _i32(indices)
    labels = np.empty(n, np.int32)
    cpts = np.empty(max(n, 1), np.int32)
    nagg = lib.naive_aggregation(n, _ptr(Sp), _ptr(Sj), _ptr(labels),
                                 _ptr(cpts))
    return labels, cpts[:nagg]


def rs_cf_splitting(n, Sp, Sj, Tp, Tj, influence=None, second_pass=False):
    """Classic RS splitting. Returns int32 splitting (1=C, 0=F) or None."""
    lib = get_lib()
    if lib is None:
        return None
    Sp, Sj, Tp, Tj = _i32(Sp), _i32(Sj), _i32(Tp), _i32(Tj)
    infl = _i32(influence if influence is not None else np.zeros(n))
    out = np.empty(n, np.int32)
    lib.rs_cf_splitting(n, _ptr(Sp), _ptr(Sj), _ptr(Tp), _ptr(Tj),
                        _ptr(infl), _ptr(out))
    if second_pass:
        lib.rs_cf_splitting_pass2(n, _ptr(Sp), _ptr(Sj), _ptr(out))
    return out


def first_fit_coloring(n, indptr, indices):
    """Greedy first-fit coloring (graph.h:248). (colors, ncolors) or None."""
    lib = get_lib()
    if lib is None:
        return None
    Ap, Aj = _i32(indptr), _i32(indices)
    colors = np.empty(max(n, 1), np.int32)
    nc = lib.first_fit_coloring(n, _ptr(Ap), _ptr(Aj), _ptr(colors))
    return colors[:n], int(nc)
