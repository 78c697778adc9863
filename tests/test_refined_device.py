"""On-device mixed-precision solve path (DS outer + f32 inner) and the
collapsed-coarse dense-tail cycle.

These are the headline-bench code paths (``bench.py``); validated here on
the CPU backend against f64 ground truth.
"""

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.gallery import poisson
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.sparse.matrix import to_scipy


def _build(n=64, **kw):
    A64 = poisson((n, n))
    ml = smoothed_aggregation_solver(A64.astype(jnp.float32),
                                     aggregate=("grid", {}),
                                     max_coarse=10, **kw)
    return A64, ml


def test_collapse_coarse_preserves_convergence():
    A64, ml = _build(64)
    b = np.random.default_rng(0).standard_normal(A64.shape[0])
    res_full = []
    ml.solve(b.astype(np.float32), tol=1e-6, maxiter=30, accel="cg",
             residuals=res_full)
    nlev_full = len(ml.levels)

    A64b, mlc = _build(64)
    mlc.collapse_coarse(max_n=600)
    assert len(mlc.levels) < nlev_full
    # coarse solver is a dense precomputed inverse applied as a matmul
    assert mlc.coarse_solver.kind == "pinv"
    res_c = []
    mlc.solve(b.astype(np.float32), tol=1e-6, maxiter=30, accel="cg",
              residuals=res_c)
    # exact tail solve: at least as good a preconditioner
    assert len(res_c) <= len(res_full) + 1
    assert res_c[-1] / res_c[0] < 1e-6


def test_collapse_coarse_noop_cases():
    A64, ml = _build(16)          # small: first level may already be <= max_n
    nlev = len(ml.levels)
    ml.collapse_coarse(max_n=10 ** 9)   # would cut at level 0 -> no-op
    assert len(ml.levels) == nlev


def test_solve_refined_device_reaches_1em10():
    A64, ml = _build(64)
    ml.collapse_coarse(max_n=600)
    As = to_scipy(A64)
    n = As.shape[0]
    rng = np.random.default_rng(2022)
    b = rng.standard_normal(n)
    res = []
    it = {}
    x = ml.solve_refined_device(b, tol=1e-10, residuals=res,
                                iterations_out=it)
    rel = np.linalg.norm(b - As @ x) / np.linalg.norm(b)
    assert rel < 1e-10
    assert res[0] > res[-1]
    assert it["outer"] >= 1 and it["inner"] >= it["outer"]
    # matches the host-loop refined solve
    res_h = []
    xh = ml.solve_refined(b, tol=1e-10, residuals=res_h)
    relh = np.linalg.norm(b - As @ xh) / np.linalg.norm(b)
    assert relh < 1e-10
    # same outer-iteration count (same algorithm, same inner solver)
    assert abs(len(res) - len(res_h)) <= 1


def test_solve_refined_device_converged_rhs():
    """b = 0 converges immediately without running an inner solve."""
    A64, ml = _build(32)
    x = ml.solve_refined_device(np.zeros(A64.shape[0]))
    assert np.allclose(x, 0)
