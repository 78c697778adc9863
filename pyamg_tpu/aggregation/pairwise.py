"""Pairwise (unsmoothed) aggregation solver (reference
``pyamg/aggregation/pairwise.py:14``): hierarchy built purely from
Notay-style pairwise matchings, tentative prolongator used directly as P.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import on_setup_device, ELL, BELL, asarray_or_ell
from pyamg_tpu.multilevel import MultilevelSolver, Level
from pyamg_tpu.relaxation.smoothing import change_smoothers, unpack_arg
from pyamg_tpu.aggregation.aggregate import pairwise_aggregation
from pyamg_tpu.aggregation.aggregation import _galerkin, _transpose
from pyamg_tpu.util.utils import levelize


@on_setup_device
def pairwise_solver(A,
                    aggregate=("pairwise", {"theta": 0.25,
                                            "norm": "min",
                                            "matchings": 2}),
                    presmoother=("block_gauss_seidel",
                                 {"sweep": "symmetric"}),
                    postsmoother=("block_gauss_seidel",
                                  {"sweep": "symmetric"}),
                    max_levels=20, max_coarse=10, coarse_solver="pinv",
                    seed=0, **kwargs):
    """Pairwise-aggregation AMG hierarchy (reference ``pairwise.py:14``)."""
    A = asarray_or_ell(A)
    if A.shape[0] != A.shape[1]:
        raise ValueError("expected square matrix")
    aggregate = levelize(aggregate, max_levels)

    levels = [Level(A=A)]
    while len(levels) < max_levels and \
            levels[-1].A.shape[0] > max_coarse:
        lvl_idx = len(levels) - 1
        A_l = levels[-1].A
        fn, akwargs = unpack_arg(aggregate[lvl_idx])
        if fn != "pairwise":
            raise ValueError("aggregate method must be 'pairwise'")
        akwargs = dict(akwargs)
        akwargs.setdefault("seed", seed + lvl_idx)
        AggOp, Cnodes = pairwise_aggregation(A_l, **akwargs)
        nagg = AggOp.shape[1]
        if nagg == 0 or nagg >= AggOp.shape[0]:
            break
        # tentative P = normalized aggregation operator (unsmoothed)
        from pyamg_tpu.aggregation.tentative import fit_candidates
        n = A_l.shape[0]
        B = jnp.ones((n, 1), dtype=A_l.dtype)
        P, _ = fit_candidates(AggOp, B)
        R = _transpose(P, conjugate=True)
        levels[-1].AggOp = AggOp
        levels[-1].P = P
        levels[-1].R = R
        Ac = _galerkin(R, A_l, P)
        levels.append(Level(A=Ac))

    ml = MultilevelSolver(levels, coarse_solver=coarse_solver)
    change_smoothers(ml, presmoother, postsmoother)
    return ml
