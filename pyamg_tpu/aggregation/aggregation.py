"""Smoothed-aggregation solver constructor.

Reference: ``pyamg/aggregation/aggregation.py:26``
(``smoothed_aggregation_solver``): per level — strength of connection,
aggregation, candidate improvement (relax on A x = 0), tentative
prolongator via batched QR, prolongation smoothing, restriction by
symmetry, Galerkin triple product.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import on_setup_device, ELL, BELL, asarray_or_ell
from pyamg_tpu.multilevel import MultilevelSolver, Level
from pyamg_tpu.relaxation.smoothing import (
    change_smoothers, unpack_arg, make_smoother, apply_smoother)
from pyamg_tpu.strength import strength_measure
from pyamg_tpu.aggregation.aggregate import aggregate_dispatch
from pyamg_tpu.aggregation.tentative import fit_candidates
from pyamg_tpu.aggregation.smooth import smooth_prolongator
from pyamg_tpu.util.utils import levelize
from pyamg_tpu.ops import spgemm, spgemm_bell, transpose, btranspose


def _galerkin(R, A, P):
    if isinstance(A, BELL):
        return spgemm_bell(spgemm_bell(R, A), P)
    return spgemm(spgemm(R, A), P)


def _transpose(P, conjugate):
    if isinstance(P, BELL):
        return btranspose(P, conjugate=conjugate)
    return transpose(P, conjugate=conjugate)


def _improve_candidates(A, B, spec):
    fn, kwargs = unpack_arg(spec)
    if fn is None:
        return B
    kind, sopts, params = make_smoother(None, A, (fn, kwargs))
    z = np.zeros_like(np.asarray(B))
    return apply_smoother(kind, sopts, params, A, np.asarray(B), z)


@on_setup_device
def smoothed_aggregation_solver(A, B=None, BH=None, symmetry="hermitian",
                                strength="symmetric", aggregate="standard",
                                smooth=("jacobi", {"omega": 4.0 / 3.0}),
                                presmoother=("block_gauss_seidel",
                                             {"sweep": "symmetric"}),
                                postsmoother=("block_gauss_seidel",
                                              {"sweep": "symmetric"}),
                                improve_candidates=(("block_gauss_seidel",
                                                     {"sweep": "symmetric",
                                                      "iterations": 4}),
                                                    None),
                                max_levels=10, max_coarse=10,
                                diagonal_dominance=False, keep=False,
                                coarse_solver="pinv", seed=0, **kwargs):
    """Smoothed-aggregation AMG hierarchy (reference
    ``aggregation.py:26``); accepts ELL/BELL or scipy input.

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.aggregation import smoothed_aggregation_solver
    >>> ml = smoothed_aggregation_solver(poisson((30, 30)), max_coarse=10)
    >>> len(ml.levels) >= 2
    True
    >>> res = []
    >>> b = np.ones(900)
    >>> x = ml.solve(b, tol=1e-8, maxiter=50, accel="cg", residuals=res)
    >>> bool(res[-1] < 1e-8 * np.linalg.norm(b) + 1e-12)
    True
    """
    A = asarray_or_ell(A)
    if symmetry not in ("symmetric", "hermitian", "nonsymmetric"):
        raise ValueError("expected symmetric, nonsymmetric or hermitian")
    n = A.shape[0]
    blocksize = A.blocksize[0] if isinstance(A, BELL) else 1
    if B is None:
        if blocksize == 1:
            B = np.ones((n, 1), dtype=A.dtype)
        else:
            B = np.asarray(np.kron(np.ones((n // blocksize, 1)),
                                   np.eye(blocksize)), dtype=A.dtype)
    else:
        B = np.asarray(B, dtype=A.dtype)
        if B.ndim == 1:
            B = B[:, None]
    if symmetry == "nonsymmetric":
        BH = B if BH is None else np.asarray(BH, dtype=A.dtype)
        if BH.ndim == 1:
            BH = BH[:, None]

    strength = levelize(strength, max_levels)
    aggregate = levelize(aggregate, max_levels)
    smooth = levelize(smooth, max_levels)
    improve_candidates = levelize(improve_candidates, max_levels)

    levels = [Level(A=A)]
    levels[0].B = B
    levels[0].symmetry = symmetry
    if symmetry == "nonsymmetric":
        levels[0].BH = BH

    while len(levels) < max_levels and \
            levels[-1].A.shape[0] // (levels[-1].A.blocksize[0]
                                      if isinstance(levels[-1].A, BELL)
                                      else 1) > max_coarse:
        if not _extend_hierarchy(levels, strength, aggregate, smooth,
                                 improve_candidates, diagonal_dominance,
                                 keep, symmetry, seed):
            break

    ml = MultilevelSolver(levels, coarse_solver=coarse_solver)
    change_smoothers(ml, presmoother, postsmoother)
    return ml


def _extend_hierarchy(levels, strength, aggregate, smooth,
                      improve_candidates, diagonal_dominance, keep,
                      symmetry, seed):
    """One coarsening step (reference ``aggregation.py:280-432``).
    Returns False if coarsening stalls."""
    import time as _time
    lvl_idx = len(levels) - 1
    A = levels[-1].A
    B = levels[-1].B
    _t = {}
    _t0 = _time.perf_counter()

    def _mark(key):
        nonlocal _t0
        now = _time.perf_counter()
        _t[key] = _t.get(key, 0.0) + (now - _t0)
        _t0 = now

    AH = None
    BH = None
    if symmetry == "nonsymmetric":
        AH = _transpose(A, conjugate=True)
        BH = levels[-1].BH

    C = strength_measure(A, strength[lvl_idx])
    _mark("strength")
    if diagonal_dominance:
        from pyamg_tpu.util.utils import eliminate_diag_dom_nodes
        flag, dd_kwargs = unpack_arg(diagonal_dominance)
        if flag:
            C = eliminate_diag_dom_nodes(A, C, **dd_kwargs)

    # thread tensor-grid metadata (strength ops drop it) so grid-structured
    # aggregation and the PhaseStencil transfer fast path can engage
    fine_grid = A.grid if isinstance(A, ELL) else None
    if fine_grid is not None and isinstance(C, ELL):
        import dataclasses
        C = dataclasses.replace(C, grid=fine_grid)

    AggOp, Cnodes = aggregate_dispatch(C, aggregate[lvl_idx],
                                       seed=seed + lvl_idx)
    _mark("aggregate")
    coarse_grid = getattr(AggOp, "col_grid", None)
    nagg = AggOp.shape[1]
    nnodes = AggOp.shape[0]
    if nagg == 0 or nagg >= nnodes:
        return False

    B = _improve_candidates(A, B, improve_candidates[lvl_idx])
    levels[-1].B = B
    if symmetry == "nonsymmetric":
        BH = _improve_candidates(AH, BH, improve_candidates[lvl_idx])
        levels[-1].BH = BH

    _mark("improve_candidates")
    T, Bc = fit_candidates(AggOp, B)
    TH = None
    BHc = None
    if symmetry == "nonsymmetric":
        TH, BHc = fit_candidates(AggOp, BH)

    _mark("fit_candidates")
    P = smooth_prolongator(smooth[lvl_idx], A, T, C, Bc)
    _mark("smooth_P")

    # grid-aligned single-candidate coarsening keeps tensor structure:
    # tag P (fine grid x coarse grid) so compress_stencils can build the
    # gather-free PhaseStencil transfers, and tag the Galerkin product
    if (coarse_grid is not None and fine_grid is not None
            and isinstance(P, ELL) and Bc.shape[1] == 1):
        import dataclasses
        P = dataclasses.replace(P, grid=fine_grid, col_grid=coarse_grid)
    else:
        coarse_grid = None

    if symmetry == "hermitian":
        R = _transpose(P, conjugate=True)
    elif symmetry == "symmetric":
        R = _transpose(P, conjugate=False)
    else:  # nonsymmetric
        PH = smooth_prolongator(smooth[lvl_idx], AH, TH, C, BHc)
        R = _transpose(PH, conjugate=True)

    if keep:
        levels[-1].C = C
        levels[-1].AggOp = AggOp
        levels[-1].T = T
    levels[-1].Cnodes = Cnodes
    levels[-1].P = P
    levels[-1].R = R

    _mark("transpose_R")
    Ac = _galerkin(R, A, P)
    _mark("rap")
    levels[-1]._setup_timings = _t
    if coarse_grid is not None and isinstance(Ac, ELL):
        import dataclasses
        Ac = dataclasses.replace(Ac, grid=coarse_grid)
    lvl = Level(A=Ac)
    lvl.B = Bc
    lvl.symmetry = symmetry
    if symmetry == "nonsymmetric":
        lvl.BH = BHc
    levels.append(lvl)
    return True
