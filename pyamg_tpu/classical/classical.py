"""Ruge-Stuben classical AMG solver constructor (reference
``pyamg/classical/classical.py:20``): per level — strength of connection,
C/F splitting, classical/direct interpolation, R = P^T, Galerkin product.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import on_setup_device, ELL, asarray_or_ell
from pyamg_tpu.multilevel import MultilevelSolver, Level
from pyamg_tpu.relaxation.smoothing import change_smoothers, unpack_arg
from pyamg_tpu.strength import strength_measure
from pyamg_tpu.classical import split as split_mod
from pyamg_tpu.classical.interpolate import (
    direct_interpolation, classical_interpolation, injection_interpolation,
    one_point_interpolation)
from pyamg_tpu.ops import spgemm, transpose


@on_setup_device
def ruge_stuben_solver(A,
                       strength=("classical", {"theta": 0.25}),
                       CF=("RS", {"second_pass": False}),
                       interpolation="classical",
                       presmoother=("gauss_seidel", {"sweep": "symmetric"}),
                       postsmoother=("gauss_seidel", {"sweep": "symmetric"}),
                       max_levels=30, max_coarse=10, keep=False,
                       coarse_solver="pinv", seed=0, **kwargs):
    """Classical (Ruge-Stuben) AMG hierarchy (reference
    ``classical.py:20``); accepts ELL or scipy input.

    Examples
    --------
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.classical import ruge_stuben_solver
    >>> A = poisson((10, 10))
    >>> ml = ruge_stuben_solver(A, max_coarse=3)
    """
    A = asarray_or_ell(A)
    if A.shape[0] != A.shape[1]:
        raise ValueError("expected square matrix")

    levels = [Level(A=A)]
    while len(levels) < max_levels and levels[-1].A.shape[0] > max_coarse:
        bottom = _extend_hierarchy(levels, strength, CF, interpolation,
                                   keep, seed + len(levels))
        if bottom:
            break

    ml = MultilevelSolver(levels, coarse_solver=coarse_solver)
    change_smoothers(ml, presmoother, postsmoother)
    return ml


def _extend_hierarchy(levels, strength, CF, interpolation, keep, seed):
    """One coarsening step (reference ``classical.py:123-203``).
    Returns True when coarsening must stop."""
    import time as _time
    A = levels[-1].A
    _t = {}
    _t0 = _time.perf_counter()

    def _mark(key):
        nonlocal _t0
        now = _time.perf_counter()
        _t[key] = _t.get(key, 0.0) + (now - _t0)
        _t0 = now

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
    elif fn == "injection":
        P = injection_interpolation(A, splitting, **ikwargs)
    elif fn == "one_point":
        P = one_point_interpolation(A, C, splitting, **ikwargs)
    else:
        raise ValueError(f"unknown interpolation method {interpolation}")

    _mark("interpolate")
    R = transpose(P)
    _mark("transpose_R")

    if keep:
        levels[-1].C = C
    levels[-1].splitting = np.asarray(splitting).astype(bool)
    levels[-1].P = P
    levels[-1].R = R

    Ac = spgemm(spgemm(R, A), P)
    _mark("rap")
    levels[-1]._setup_timings = _t
    levels.append(Level(A=Ac))
    return False
