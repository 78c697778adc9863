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
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.remove_strong_ff_ell.restype = None
        lib.remove_strong_ff_ell.argtypes = [
            ctypes.c_int32, ctypes.c_int32, i32p, f64p, i32p, i32p, i32p]
        lib.classical_interpolation_ell.restype = None
        lib.classical_interpolation_ell.argtypes = [
            ctypes.c_int32, ctypes.c_int32, i32p, f64p, i32p,
            ctypes.c_int32, i32p, f64p, i32p,
            i32p, i32p, ctypes.c_int32,
            ctypes.c_int32, i32p, f64p, i32p]
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


def _f64(a):
    return np.ascontiguousarray(np.asarray(a), dtype=np.float64)


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def remove_strong_ff_ell(s_cols, s_vals, s_nnz, split):
    """Drop mask (n, Ws) int32 for strong F-F entries lacking a common
    strong C (ruge_stuben.h:1133); None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n, Ws = s_cols.shape
    sc, sn, sp = _i32(s_cols), _i32(s_nnz), _i32(split)
    sv = _f64(s_vals)
    drop = np.empty((n, Ws), np.int32)
    lib.remove_strong_ff_ell(n, Ws, _ptr(sc), _fptr(sv), _ptr(sn),
                             _ptr(sp), _ptr(drop))
    return drop.astype(bool)


def classical_interpolation_ell(a_cols, a_vals, a_nnz, s_cols, s_vals,
                                s_nnz, split, cmap, modified, Wp):
    """(p_cols, p_vals, p_nnz) padded-ELL arrays for (modified) classical
    interpolation (ruge_stuben.h:1083,1239); None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n, Wa = a_cols.shape
    Ws = s_cols.shape[1]
    ac, an = _i32(a_cols), _i32(a_nnz)
    av = _f64(a_vals)
    sc, sn = _i32(s_cols), _i32(s_nnz)
    sv = _f64(s_vals)
    sp, cm = _i32(split), _i32(cmap)
    Wp = max(int(Wp), 1)
    p_cols = np.zeros((n, Wp), np.int32)
    p_vals = np.zeros((n, Wp), np.float64)
    p_nnz = np.zeros((n,), np.int32)
    lib.classical_interpolation_ell(
        n, Wa, _ptr(ac), _fptr(av), _ptr(an),
        Ws, _ptr(sc), _fptr(sv), _ptr(sn),
        _ptr(sp), _ptr(cm), int(bool(modified)),
        Wp, _ptr(p_cols), _fptr(p_vals), _ptr(p_nnz))
    return p_cols, p_vals, p_nnz
