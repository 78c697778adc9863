"""AIR: approximate-ideal-restriction AMG (reference
``pyamg/classical/air.py:21``), for nonsymmetric/advective systems.

Hierarchy loop: strength -> C/F splitting (RS second pass default) ->
P (one-point default) -> R = lAIR (batched local solves) -> A_c = R A P,
with FC-Jacobi post-smoothing.
"""

from __future__ import annotations

import numpy as np

from pyamg_tpu.sparse.matrix import on_setup_device, ELL, asarray_or_ell
from pyamg_tpu.multilevel import MultilevelSolver, Level
from pyamg_tpu.relaxation.smoothing import change_smoothers, unpack_arg
from pyamg_tpu.strength import strength_measure
from pyamg_tpu.classical import split as split_mod
from pyamg_tpu.classical.interpolate import (
    direct_interpolation, classical_interpolation, injection_interpolation,
    one_point_interpolation, local_air)
from pyamg_tpu.ops import spgemm


@on_setup_device
def air_solver(A,
               strength=("classical", {"theta": 0.3, "norm": "min"}),
               CF=("RS", {"second_pass": True}),
               interpolation="one_point",
               restrict=("air", {"theta": 0.05, "degree": 2}),
               presmoother=None,
               postsmoother=("fc_jacobi", {"omega": 1.0, "iterations": 1,
                                           "withrho": False,
                                           "f_iterations": 2,
                                           "c_iterations": 1}),
               filter_operator=None,
               max_levels=20, max_coarse=20, keep=False,
               coarse_solver="pinv", seed=0, **kwargs):
    """AIR AMG hierarchy (reference ``air.py:21``); ELL or scipy input."""
    A = asarray_or_ell(A)
    if A.shape[0] != A.shape[1]:
        raise ValueError("expected square matrix")

    levels = [Level(A=A)]
    while len(levels) < max_levels and levels[-1].A.shape[0] > max_coarse:
        bottom = _extend_hierarchy(levels, strength, CF, interpolation,
                                   restrict, filter_operator, keep,
                                   seed + len(levels))
        if bottom:
            break

    ml = MultilevelSolver(levels, coarse_solver=coarse_solver)
    change_smoothers(ml, presmoother, postsmoother)
    return ml


def _extend_hierarchy(levels, strength, CF, interpolation, restrict,
                      filter_operator, keep, seed):
    """One AIR coarsening step (reference ``air.py:136-242``)."""
    import time as _time
    A = levels[-1].A
    _t = {}
    _t0 = _time.perf_counter()

    def _mark(key):
        nonlocal _t0
        now = _time.perf_counter()
        _t[key] = _t.get(key, 0.0) + (now - _t0)
        _t0 = now

    if filter_operator is not None and filter_operator[1] != 0:
        from pyamg_tpu.util.utils import filter_matrix_rows
        A = filter_matrix_rows(A, filter_operator[1], diagonal=True,
                               lump=filter_operator[0])
    _mark("filter")
    if A.nnz == A.shape[0]:
        return True

    C = strength_measure(A, strength, default=("classical", {}))
    _mark("strength")

    fn, cf_kwargs = unpack_arg(CF)
    if fn == "CR":
        from pyamg_tpu.classical.cr import CR
        splitting = CR(C, **cf_kwargs)
    else:
        splitting = split_mod.split_dispatch(C, CF, seed=seed)
    _mark("split")

    num_cpts = int(np.sum(splitting))
    if num_cpts == len(splitting) or num_cpts == 0:
        return True

    fn, ikwargs = unpack_arg(interpolation)
    if fn == "classical":
        P = classical_interpolation(A, C, splitting, **ikwargs)
    elif fn == "direct":
        P = direct_interpolation(A, C, splitting, **ikwargs)
    elif fn == "one_point":
        P = one_point_interpolation(A, C, splitting, **ikwargs)
    elif fn == "injection":
        P = injection_interpolation(A, splitting, **ikwargs)
    else:
        raise ValueError(f"unknown interpolation method {interpolation}")
    _mark("interpolate")

    fn, rkwargs = unpack_arg(restrict)
    if fn in ("air", "lair"):
        R = local_air(A, splitting, **rkwargs)
    else:
        raise ValueError(f"unknown restriction method {restrict}")
    _mark("lair_restrict")

    splitting = np.asarray(splitting)
    levels[-1].splitting = splitting.astype(bool)
    levels[-1].Fpts = np.where(splitting == 0)[0]
    levels[-1].Cpts = np.where(splitting == 1)[0]
    if keep:
        levels[-1].C = C
    levels[-1].P = P
    levels[-1].R = R

    Ac = spgemm(spgemm(R, A), P)
    _mark("rap")
    levels[-1]._setup_timings = _t
    levels.append(Level(A=Ac))
    return False
