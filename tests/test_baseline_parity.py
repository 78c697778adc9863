"""Hierarchy-quality parity vs the reference's published numbers
(BASELINE.md): the JOSS-paper artifact and the multilevel doctest."""

import numpy as np
import pytest

from pyamg_tpu.gallery import poisson
from pyamg_tpu.classical import ruge_stuben_solver
from pyamg_tpu.aggregation import smoothed_aggregation_solver


def test_rs_2level_complexities_doctest():
    """Reference multilevel.py:115-124 doctest: 2-level RS on 100x100
    Poisson has OC 1.891, GC 1.500."""
    ml = ruge_stuben_solver(poisson((100, 100)), max_levels=2)
    assert abs(ml.operator_complexity() - 1.891) < 0.005
    assert abs(ml.grid_complexity() - 1.500) < 0.005


@pytest.mark.slow
def test_sa_paper_artifact_1m():
    """Reference docs/paper/paper.md:150-165 + example.res.txt: SA on
    1000x1000 Poisson (1M unknowns, max_coarse=10) gives 7 levels,
    OC 1.338, GC 1.188, and 21 standalone V(1,1) iterations to 1e-10
    (seeded).  We assert the same hierarchy shape and <=23 iterations."""
    ml = smoothed_aggregation_solver(poisson((1000, 1000)), max_coarse=10)
    assert len(ml.levels) == 7
    assert abs(ml.operator_complexity() - 1.338) < 0.01
    assert abs(ml.grid_complexity() - 1.188) < 0.005
    rng = np.random.default_rng(2022)
    b = rng.standard_normal(ml.levels[0].A.shape[0])
    res = []
    ml.solve(b, maxiter=30, tol=1e-10, residuals=res)
    assert res[-1] / res[0] < 1e-10
    assert len(res) - 1 <= 23


def test_cycle_complexity_reference_semantics():
    """Exact reference recursion (``multilevel.py:211-284``): per level
    visit 2*nnz, coarsest solve nnz; W visits coarser levels twice, F
    once plus a V."""
    import jax
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.classical import ruge_stuben_solver

    A = poisson((100, 100))
    ml = ruge_stuben_solver(A, max_levels=2)
    nnz = [l.A.nnz for l in ml.levels]
    exp = (2 * nnz[0] + nnz[1]) / nnz[0]
    assert abs(ml.cycle_complexity("V") - exp) < 1e-12
    assert abs(ml.cycle_complexity("W") - exp) < 1e-12   # 2-level: same

    ml3 = ruge_stuben_solver(A, max_levels=4)
    nnz = [l.A.nnz for l in ml3.levels]

    def V(l):
        return 2 * nnz[l] + nnz[l + 1] if l == len(nnz) - 2 \
            else 2 * nnz[l] + V(l + 1)

    def W(l):
        return 2 * nnz[l] + nnz[l + 1] if l == len(nnz) - 2 \
            else 2 * nnz[l] + 2 * W(l + 1)

    def F(l):
        return 2 * nnz[l] + nnz[l + 1] if l == len(nnz) - 2 \
            else 2 * nnz[l] + F(l + 1) + V(l + 1)

    assert abs(ml3.cycle_complexity("V") - V(0) / nnz[0]) < 1e-12
    assert abs(ml3.cycle_complexity("W") - W(0) / nnz[0]) < 1e-12
    assert abs(ml3.cycle_complexity("AMLI") - W(0) / nnz[0]) < 1e-12
    assert abs(ml3.cycle_complexity("F") - F(0) / nnz[0]) < 1e-12
    assert ml3.cycle_complexity("W") > ml3.cycle_complexity("F") > \
        ml3.cycle_complexity("V")
