"""Utility-layer tests (reference ``pyamg/util/tests``)."""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse.matrix import from_scipy, to_scipy
from pyamg_tpu.util import (
    scale_rows, scale_columns, symmetric_rescaling, symmetric_rescaling_sa,
    filter_matrix_columns, scale_rows_by_largest_entry, amalgamate, unamal,
    coord_to_rbm, truncate_rows, get_diagonal, norm, infinity_norm,
    approximate_spectral_radius, condest, ishermitian, pinv_array, set_tol,
    profile_solver, scale_T, get_Cpt_params, filter_operator)
from pyamg_tpu.relaxation import relaxation_as_linear_operator


def _rand_csr(n, m, seed=0, density=0.2):
    rng = np.random.default_rng(seed)
    M = sp.random_array((n, m), density=density, rng=rng, format="csr")
    M.data = rng.standard_normal(M.nnz)
    return M


def test_filter_matrix_columns_gold():
    S = _rand_csr(20, 20, 1).tolil()
    S.setdiag(2.0)
    S = S.tocsr()
    theta = 0.5
    F = to_scipy(filter_matrix_columns(from_scipy(S), theta)).toarray()
    D = S.toarray()
    colmax = np.abs(D).max(axis=0)
    gold = np.where(np.abs(D) >= theta * colmax[None, :], D, 0)
    np.testing.assert_allclose(F, gold)


def test_scale_rows_by_largest_entry():
    A = poisson((10, 10))
    S = to_scipy(scale_rows_by_largest_entry(A)).toarray()
    assert np.allclose(np.abs(S).max(axis=1), 1.0)


def test_symmetric_rescaling_sa_preserves_solution_space():
    A = poisson((30,))
    B = np.ones((30, 1))
    DAD, DB, _ = symmetric_rescaling_sa(A, B)
    D = to_scipy(DAD)
    # unit diagonal after rescaling
    np.testing.assert_allclose(D.diagonal(), 1.0)
    # DAD @ DB == D^-1/2 (A @ B)
    gold = to_scipy(A) @ B
    d_isqrt = 1 / np.sqrt(to_scipy(A).diagonal())
    np.testing.assert_allclose(np.asarray(D @ DB), d_isqrt[:, None] * gold,
                               atol=1e-12)


def test_scale_rows_columns_gold():
    S = _rand_csr(15, 12, 3)
    v = np.arange(1, 16, dtype=float)
    w = np.arange(1, 13, dtype=float)
    np.testing.assert_allclose(
        to_scipy(scale_rows(from_scipy(S), jnp.asarray(v))).toarray(),
        sp.diags_array(v) @ S.toarray())
    np.testing.assert_allclose(
        to_scipy(scale_columns(from_scipy(S), jnp.asarray(w))).toarray(),
        S.toarray() @ sp.diags_array(w))


def test_amalgamate_roundtrip():
    A = poisson((6, 6))
    Am = amalgamate(A, 2)
    assert Am.shape == (18, 18)
    U = unamal(Am, 2, 2)
    assert U.shape == (36, 36)
    # unamal'ed pattern contains the blocked pattern of A
    gold = (np.kron((np.abs(to_scipy(Am).toarray()) > 0), np.ones((2, 2)))
            > 0)
    got = np.abs(to_scipy(U).toarray()) > 0
    assert (got == gold).all()


def test_coord_to_rbm_2d():
    n = 9
    xy = np.stack(np.meshgrid(np.arange(3.), np.arange(3.)),
                  axis=-1).reshape(-1, 2)
    B = coord_to_rbm(xy)
    assert B.shape == (2 * n, 3)
    # translations + in-plane rotation are exactly representable
    assert np.linalg.matrix_rank(np.asarray(B)) == 3


def test_truncate_rows_keeps_largest():
    S = _rand_csr(10, 10, 5, density=0.8)
    T = to_scipy(truncate_rows(from_scipy(S), 3)).toarray()
    assert (np.count_nonzero(T, axis=1) <= 3).all()
    D = S.toarray()
    for i in range(10):
        kept = np.abs(T[i])[T[i] != 0]
        if kept.size == 3:
            dropped = np.abs(D[i])[(D[i] != 0) & (T[i] == 0)]
            if dropped.size:
                assert kept.min() >= dropped.max() - 1e-12


def test_norms_and_tol():
    v = np.array([3.0, -4.0])
    assert abs(norm(v) - 5.0) < 1e-14
    A = poisson((8, 8))
    assert abs(infinity_norm(A) - np.abs(to_scipy(A)).sum(axis=1).max()) \
        < 1e-12
    assert set_tol(np.float64) < set_tol(np.float32)


def test_spectral_radius_and_condest():
    A = poisson((40,))
    rho = approximate_spectral_radius(A)
    eigs = np.linalg.eigvalsh(to_scipy(A).toarray())
    assert abs(rho - eigs.max()) / eigs.max() < 0.05
    c = condest(A)
    gold = eigs.max() / eigs.min()
    assert 0.1 * gold < c < 10 * gold


def test_ishermitian():
    A = poisson((7, 7))
    assert ishermitian(A)
    S = to_scipy(A).tolil()
    S[0, 1] = 99.0
    assert not ishermitian(from_scipy(S.tocsr()))


def test_pinv_array_batched():
    rng = np.random.default_rng(0)
    blocks = rng.standard_normal((5, 3, 3))
    P = np.asarray(pinv_array(jnp.asarray(blocks)))
    for i in range(5):
        np.testing.assert_allclose(P[i], np.linalg.pinv(blocks[i]),
                                   atol=1e-10)


def test_relaxation_as_linear_operator_improves():
    A = poisson((12, 12))
    op = relaxation_as_linear_operator(
        ("gauss_seidel", {"sweep": "symmetric"}), A)
    rng = np.random.default_rng(0)
    V = rng.standard_normal((A.shape[0], 2))
    W = op @ V
    S = to_scipy(A)
    assert np.linalg.norm(S @ W) < 0.5 * np.linalg.norm(S @ V)


def test_profile_solver_runs():
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    ml = smoothed_aggregation_solver(poisson((12, 12)), max_coarse=10)
    out = profile_solver(ml)
    assert out is not None


def test_scale_T_identity_at_cpts():
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    # scale_T / get_Cpt_params behavior is covered in rootnode tests;
    # here: C-point rows of scaled T are unit rows.
    A = poisson((16,))
    from pyamg_tpu.aggregation.aggregate import standard_aggregation
    from pyamg_tpu.aggregation.tentative import fit_candidates
    AggOp, Cpts = standard_aggregation(A)
    T, _ = fit_candidates(AggOp, np.ones((16, 1)))
    Ts = scale_T(T, Cpts)
    D = to_scipy(Ts).toarray()
    for j, c in enumerate(np.asarray(Cpts)):
        row = D[int(c)]
        assert abs(row[j] - 1.0) < 1e-12
        assert np.abs(np.delete(row, j)).max() < 1e-12


class TestHierarchySerialization:
    """save_hierarchy/load_hierarchy round-trip (SURVEY.md §5.4: the
    reference's reusable artifact is the live solver; ours checkpoints)."""

    def test_roundtrip_identical_residuals(self, tmp_path):
        import numpy as np
        import jax.numpy as jnp
        from pyamg_tpu.gallery import poisson
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        from pyamg_tpu.io import save_hierarchy, load_hierarchy
        A = poisson((24, 24))
        ml = smoothed_aggregation_solver(A, max_coarse=10)
        p = str(tmp_path / "hier.npz")
        save_hierarchy(ml, p)
        ml2 = load_hierarchy(p)
        b = np.random.default_rng(5).standard_normal(A.shape[0])
        r1, r2 = [], []
        x1 = ml.solve(jnp.asarray(b), maxiter=12, tol=1e-12, residuals=r1)
        x2 = ml2.solve(jnp.asarray(b), maxiter=12, tol=1e-12, residuals=r2)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    def test_roundtrip_rs_and_coarse_lu(self, tmp_path):
        import numpy as np
        import jax.numpy as jnp
        from pyamg_tpu.gallery import poisson
        from pyamg_tpu.classical import ruge_stuben_solver
        from pyamg_tpu.io import save_hierarchy, load_hierarchy
        A = poisson((16, 16))
        ml = ruge_stuben_solver(A, coarse_solver="lu")
        p = str(tmp_path / "h2.npz")
        save_hierarchy(ml, p)
        ml2 = load_hierarchy(p)
        b = np.random.default_rng(1).standard_normal(A.shape[0])
        r1, r2 = [], []
        ml.solve(jnp.asarray(b), maxiter=10, tol=1e-12, residuals=r1)
        ml2.solve(jnp.asarray(b), maxiter=10, tol=1e-12, residuals=r2)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    def test_roundtrip_bsr_elasticity(self, tmp_path):
        import numpy as np
        import jax.numpy as jnp
        from pyamg_tpu.gallery import linear_elasticity
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        from pyamg_tpu.io import save_hierarchy, load_hierarchy
        A, B = linear_elasticity((8, 8))
        ml = smoothed_aggregation_solver(A, B=np.asarray(B), max_coarse=12)
        p = str(tmp_path / "h3.npz")
        save_hierarchy(ml, p)
        ml2 = load_hierarchy(p)
        b = np.random.default_rng(2).standard_normal(A.shape[0])
        r1, r2 = [], []
        ml.solve(jnp.asarray(b), maxiter=8, tol=1e-12, residuals=r1)
        ml2.solve(jnp.asarray(b), maxiter=8, tol=1e-12, residuals=r2)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_profile_and_trace_cycle(tmp_path):
    """Profiling hooks: profile_cycle returns a sane wall time and
    trace_cycle emits a jax.profiler trace directory."""
    import jax.numpy as jnp
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    ml = smoothed_aggregation_solver(poisson((24, 24)).astype(jnp.float32),
                                     max_coarse=16)
    t = ml.profile_cycle(k1=2, k2=6)
    assert 0 < t < 5.0
    out = ml.trace_cycle(tmp_path / "trace", iterations=2)
    import os
    assert any(os.scandir(out))
