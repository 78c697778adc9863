"""Distributed halo-exchange SpMV vs single-device gold.

The reference has no distributed layer (SURVEY.md §2.3); these tests
validate the new TPU-native comm-plan design on a virtual 8-device CPU
mesh (conftest sets xla_force_host_platform_device_count).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyamg_tpu.gallery import poisson, sprand
from pyamg_tpu.sparse.matrix import from_scipy, to_scipy
from pyamg_tpu.parallel import make_row_mesh
from pyamg_tpu.parallel.halo import build_halo, extract_diagonal_halo

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device mesh")


def _check(A_ell, ndev=None):
    mesh = make_row_mesh(ndev)
    H = build_halo(A_ell, mesh)
    n_pad, m_pad = H.shape
    rng = np.random.default_rng(7)
    x = np.zeros(m_pad)
    x[:A_ell.shape[1]] = rng.standard_normal(A_ell.shape[1])
    y = jax.jit(H.mv)(jnp.asarray(x))
    gold = to_scipy(A_ell) @ x[:A_ell.shape[1]]
    np.testing.assert_allclose(np.asarray(y)[:A_ell.shape[0]], gold,
                               rtol=1e-12, atol=1e-12)
    return H


def test_halo_spmv_poisson_2d():
    A = poisson((23, 17))
    H = _check(A)
    # contiguous row blocks of a 2-D stencil: ring-neighbour traffic only
    assert set(H.offsets) <= {1, len(jax.devices()) - 1}


def test_halo_spmv_random_general_graph():
    S = to_scipy(sprand(150, 150, 6.0 / 150, seed=3))
    S = (S + S.T).tocsr()  # scattered couplings hit many device pairs
    _check(from_scipy(S))


def test_halo_spmv_rectangular_transfer():
    # P-shaped operator: fine rows x coarse cols
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    n, m = 97, 25
    rows = np.arange(n)
    cols = np.minimum((rows // 4), m - 1)
    P = sp.csr_array((rng.standard_normal(n), (rows, cols)), shape=(n, m))
    _check(from_scipy(P))


def test_halo_diagonal():
    A = poisson((40,))
    mesh = make_row_mesh()
    H = build_halo(A, mesh)
    d = extract_diagonal_halo(H)
    gold = to_scipy(A).diagonal()
    np.testing.assert_allclose(np.asarray(d)[:40], gold)
    # identity pad rows keep the padded diagonal finite
    assert np.all(np.asarray(d)[40:] == 1)


def test_halo_matches_gspmd_spmv():
    """Halo-plan result == plain sharded-gather result (same numerics)."""
    from pyamg_tpu.ops.spmv import spmv
    A = poisson((16, 16))
    mesh = make_row_mesh()
    H = build_halo(A, mesh)
    x = np.arange(H.shape[1], dtype=np.float64)
    x[A.shape[1]:] = 0
    y_halo = np.asarray(jax.jit(H.mv)(jnp.asarray(x)))[:A.shape[0]]
    y_ref = np.asarray(spmv(A, jnp.asarray(x[:A.shape[1]])))
    np.testing.assert_allclose(y_halo, y_ref, rtol=1e-12)


def test_halo_hierarchy_solve():
    """Full SA solve with halo-plan SpMV at sharded levels matches the
    replicated solve to tight tolerance."""
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu.parallel import shard_hierarchy

    A = poisson((24, 24))
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.shape[0])

    ml_ref = smoothed_aggregation_solver(A, max_coarse=10)
    res_ref = []
    x_ref = ml_ref.solve(b, maxiter=8, tol=1e-12, residuals=res_ref)

    ml = smoothed_aggregation_solver(A, max_coarse=10)
    mesh = make_row_mesh()
    shard_hierarchy(ml, mesh, replicate_below=64, spmv="halo")
    res = []
    x = ml.solve(jnp.asarray(b), maxiter=8, tol=1e-12, residuals=res)

    np.testing.assert_allclose(np.asarray(x)[:A.shape[0]],
                               np.asarray(x_ref), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(res, res_ref, rtol=1e-8)


def test_halo_hierarchy_cg_accel():
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu.parallel import shard_hierarchy

    A = poisson((20, 20))
    rng = np.random.default_rng(2)
    b = rng.standard_normal(A.shape[0])
    ml = smoothed_aggregation_solver(A, max_coarse=10)
    shard_hierarchy(ml, make_row_mesh(), replicate_below=64, spmv="halo")
    res = []
    x = ml.solve(jnp.asarray(b), maxiter=30, tol=1e-10, accel="cg",
                 residuals=res)
    S = to_scipy(A)
    relres = np.linalg.norm(b - S @ np.asarray(x)[:A.shape[0]]) \
        / np.linalg.norm(b)
    assert relres < 1e-9
