"""Root-node smoothed aggregation solver (reference
``pyamg/aggregation/rootnode.py:25``).

Like SA, but the tentative prolongator keeps an exact identity block at
each aggregate's root node and energy minimization preserves it —
combining classical-AMG-style injection with SA's energy-minimized basis.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import on_setup_device, ELL, BELL, asarray_or_ell
from pyamg_tpu.multilevel import MultilevelSolver, Level
from pyamg_tpu.relaxation.smoothing import change_smoothers, unpack_arg
from pyamg_tpu.strength import strength_measure
from pyamg_tpu.aggregation.aggregate import aggregate_dispatch
from pyamg_tpu.aggregation.tentative import fit_candidates
from pyamg_tpu.aggregation.aggregation import _improve_candidates, \
    _galerkin, _transpose
from pyamg_tpu.aggregation.energy import energy_prolongation_smoother
from pyamg_tpu.util.utils import levelize, scale_T, get_Cpt_params


@on_setup_device
def rootnode_solver(A, B=None, BH=None, symmetry="hermitian",
                    strength="symmetric", aggregate="standard",
                    smooth="energy",
                    presmoother=("block_gauss_seidel",
                                 {"sweep": "symmetric"}),
                    postsmoother=("block_gauss_seidel",
                                  {"sweep": "symmetric"}),
                    improve_candidates=(("block_gauss_seidel",
                                         {"sweep": "symmetric",
                                          "iterations": 4}), None),
                    max_levels=10, max_coarse=10,
                    diagonal_dominance=False, keep=False,
                    coarse_solver="pinv", seed=0, **kwargs):
    """Root-node SA hierarchy (reference ``rootnode.py:25``).

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.aggregation import rootnode_solver
    >>> ml = rootnode_solver(poisson((30, 30)), max_coarse=10)
    >>> res = []
    >>> x = ml.solve(np.ones(900), tol=1e-8, maxiter=50, accel="cg",
    ...              residuals=res)
    >>> bool(res[-1] / res[0] < 1e-7)
    True
    """
    A = asarray_or_ell(A)
    if symmetry not in ("symmetric", "hermitian", "nonsymmetric"):
        raise ValueError("expected symmetric, nonsymmetric or hermitian")
    n = A.shape[0]
    blocksize = A.blocksize[0] if isinstance(A, BELL) else 1
    if B is None:
        if blocksize == 1:
            B = jnp.ones((n, 1), dtype=A.dtype)
        else:
            B = jnp.asarray(np.kron(np.ones((n // blocksize, 1)),
                                    np.eye(blocksize)), dtype=A.dtype)
    else:
        B = jnp.asarray(B, dtype=A.dtype)
        if B.ndim == 1:
            B = B[:, None]
    if B.shape[1] < blocksize:
        raise ValueError("B must have at least blocksize candidates")
    if symmetry == "nonsymmetric":
        BH = B if BH is None else jnp.asarray(BH, dtype=A.dtype)
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
    """One root-node coarsening step (reference ``rootnode.py:180+``)."""
    lvl_idx = len(levels) - 1
    A = levels[-1].A
    B = levels[-1].B
    bs = A.blocksize[0] if isinstance(A, BELL) else 1

    AH = None
    BH = None
    if symmetry == "nonsymmetric":
        AH = _transpose(A, conjugate=True)
        BH = levels[-1].BH

    C = strength_measure(A, strength[lvl_idx])
    if diagonal_dominance:
        from pyamg_tpu.util.utils import eliminate_diag_dom_nodes
        flag, dd_kwargs = unpack_arg(diagonal_dominance)
        if flag:
            C = eliminate_diag_dom_nodes(A, C, **dd_kwargs)

    AggOp, Cnodes = aggregate_dispatch(C, aggregate[lvl_idx],
                                       seed=seed + lvl_idx)
    nagg = AggOp.shape[1]
    if nagg == 0 or nagg >= AggOp.shape[0]:
        return False
    # drop empty aggregates from Cnodes bookkeeping
    Cnodes = np.asarray(Cnodes)

    B = _improve_candidates(A, B, improve_candidates[lvl_idx])
    levels[-1].B = B
    if symmetry == "nonsymmetric":
        BH = _improve_candidates(AH, BH, improve_candidates[lvl_idx])
        levels[-1].BH = BH

    # tentative prolongator from the first `bs` candidates (square blocks),
    # then right-scaled to identity at root nodes
    T, _ = fit_candidates(AggOp, B[:, :bs])
    T = scale_T(T, Cnodes)
    if symmetry == "nonsymmetric":
        TH, _ = fit_candidates(AggOp, BH[:, :bs])
        TH = scale_T(TH, Cnodes)

    params = get_Cpt_params(A, Cnodes)
    Cpts = params["Cpts"]
    # coarse candidates: injection at the C-points
    Bc = B[jnp.asarray(Cpts)]
    if symmetry == "nonsymmetric":
        BHc = BH[jnp.asarray(Cpts)]

    Cpt_params = (True, params)
    fn, skwargs = unpack_arg(smooth[lvl_idx])
    if fn == "energy":
        P = energy_prolongation_smoother(A, T, C, Bc, B,
                                         Cpt_params=Cpt_params, **skwargs)
    elif fn is None:
        P = T
    else:
        raise ValueError(f"unrecognized prolongation smoother {fn!r}")

    if symmetry == "hermitian":
        R = _transpose(P, conjugate=True)
    elif symmetry == "symmetric":
        R = _transpose(P, conjugate=False)
    else:
        if fn == "energy":
            RH = energy_prolongation_smoother(AH, TH, C, BHc, BH,
                                              Cpt_params=Cpt_params,
                                              **skwargs)
        else:
            RH = TH
        R = _transpose(RH, conjugate=True)

    if keep:
        levels[-1].C = C
        levels[-1].AggOp = AggOp
        levels[-1].T = T
    levels[-1].Cnodes = Cnodes
    levels[-1].Cpts = Cpts
    levels[-1].Fpts = params["Fpts"]
    levels[-1].P = P
    levels[-1].R = R

    Ac = _galerkin(R, A, P)
    lvl = Level(A=Ac)
    lvl.B = Bc
    lvl.symmetry = symmetry
    if symmetry == "nonsymmetric":
        lvl.BH = BHc
    levels.append(lvl)
    return True
