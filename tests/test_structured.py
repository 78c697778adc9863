"""Structured (grid) fast-path tests: DIA, grid aggregation, PhaseStencil.

Gold pattern (SURVEY.md §4): every structured container is checked
entrywise against its general ELL twin.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse.matrix import (ELL, phase_stencil_from_ell,
                                     dia_from_ell, to_scipy)
from pyamg_tpu.ops.spmv import matvec
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.aggregation.aggregate import grid_aggregation


def test_grid_aggregation_labels():
    A = poisson((7, 5))
    AggOp, Cpts = grid_aggregation(A, ratio=3)
    assert AggOp.shape == (35, 3 * 2)
    M = to_scipy(AggOp).toarray()
    # every node in exactly one aggregate
    assert np.all(M.sum(axis=1) == 1)
    # node (0,0) and (2,2) share a tile; (3,0) does not
    lab = M.argmax(axis=1)
    assert lab[0] == lab[2 * 5 + 2]
    assert lab[0] != lab[3 * 5 + 0]
    assert len(np.asarray(Cpts)) == 6


@pytest.mark.parametrize("grid", [(26,), (17, 13), (7, 6, 5)])
def test_phase_stencil_roundtrip(grid):
    """P/R compressed to PhaseStencil match their ELL twins entrywise."""
    A = poisson(grid)
    ml = smoothed_aggregation_solver(A, aggregate=("grid", {}),
                                     max_coarse=3, max_levels=3)
    P0 = [lvl.P for lvl in ml.levels[:-1]]
    R0 = [lvl.R for lvl in ml.levels[:-1]]
    ml.compress_stencils()
    rng = np.random.default_rng(0)
    compressed = 0
    for i, lvl in enumerate(ml.levels[:-1]):
        xc = jnp.asarray(rng.standard_normal(lvl.P.shape[1]))
        xf = jnp.asarray(rng.standard_normal(lvl.P.shape[0]))
        assert np.allclose(np.asarray(matvec(lvl.P, xc)),
                           np.asarray(matvec(P0[i], xc)), atol=1e-12)
        assert np.allclose(np.asarray(matvec(lvl.R, xf)),
                           np.asarray(matvec(R0[i], xf)), atol=1e-12)
        from pyamg_tpu.sparse.matrix import PhaseStencil
        compressed += isinstance(lvl.P, PhaseStencil)
    assert compressed >= 1   # the fine-level transfer must compress


def test_phase_stencil_multirhs():
    A = poisson((12, 9))
    ml = smoothed_aggregation_solver(A, aggregate=("grid", {}),
                                     max_coarse=4, max_levels=2)
    P0 = ml.levels[0].P
    ml.compress_stencils()
    P = ml.levels[0].P
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((P.shape[1], 3)))
    assert np.allclose(np.asarray(matvec(P, X)),
                       np.asarray(matvec(P0, X)), atol=1e-12)


def test_grid_sa_convergence():
    """Grid-tile SA matches PyAMG-class convergence on 2D Poisson
    (reference threshold <0.42 at 60x60, test_aggregation.py:174-181)."""
    A = poisson((40, 40))
    ml = smoothed_aggregation_solver(A, aggregate=("grid", {}),
                                     max_coarse=10)
    ml.compress_stencils()
    rng = np.random.default_rng(2022)
    b = jnp.zeros((A.shape[0],), A.dtype)
    x0 = jnp.asarray(rng.standard_normal(A.shape[0]), A.dtype)
    res = []
    ml.solve(b, x0=x0, maxiter=20, tol=1e-12, residuals=res)
    res = np.asarray(res)
    cf = (res[-1] / res[0]) ** (1.0 / (len(res) - 1))
    assert cf < 0.35, cf


def test_dia_detection_on_coarse_levels():
    A = poisson((30, 30))
    ml = smoothed_aggregation_solver(A, aggregate=("grid", {}),
                                     max_coarse=8)
    ml.compress_stencils()
    from pyamg_tpu.sparse.matrix import DIA
    assert isinstance(ml.levels[0].A, DIA)
    # Galerkin coarse operators of grid aggregation stay banded
    assert isinstance(ml.levels[1].A, DIA)


def test_grid_sa_solve_cg():
    A = poisson((32, 32))
    ml = smoothed_aggregation_solver(A, aggregate=("grid", {}),
                                     max_coarse=10)
    ml.compress_stencils()
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(A.shape[0]), A.dtype)
    res = []
    x = ml.solve(b, tol=1e-8, maxiter=30, accel="cg", residuals=res)
    assert res[-1] / res[0] < 1e-8
    r = np.asarray(b) - to_scipy(A) @ np.asarray(x)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-7
