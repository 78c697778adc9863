"""Classical AMG tests (mirrors reference
``pyamg/classical/tests/test_classical.py``, ``test_split.py``,
``test_air.py``): exact small-matrix interpolation golds, splitting
validity, convergence-factor regressions, AIR two-level exactness."""

import numpy as np
import scipy.sparse as sp
import pytest

import jax.numpy as jnp

from pyamg_tpu.gallery import poisson, advection_2d
from pyamg_tpu.sparse import from_scipy, to_scipy
from pyamg_tpu.strength import classical_strength_of_connection
from pyamg_tpu.classical import (
    ruge_stuben_solver, air_solver, split,
    direct_interpolation, classical_interpolation,
    injection_interpolation, one_point_interpolation, local_air)


def _valid_splitting(S_ell, splitting):
    """Every F point strongly depends on at least one C point (or is
    isolated)."""
    S = to_scipy(S_ell).tocsr()
    S.setdiag(0)
    S.eliminate_zeros()
    n = S.shape[0]
    ok = True
    for i in range(n):
        if splitting[i] == 1:
            continue
        nbrs = S.indices[S.indptr[i]:S.indptr[i + 1]]
        if len(nbrs) == 0:
            continue  # isolated: F by convention
        ok = ok and np.any(splitting[nbrs] == 1)
    return ok


class TestSplit:
    @pytest.mark.parametrize("method", ["RS", "PMIS", "PMISc", "CLJP",
                                        "CLJPc"])
    def test_splitting_validity(self, method):
        for A in [poisson((50,)), poisson((10, 10))]:
            C = classical_strength_of_connection(A, 0.25)
            s = split.split_dispatch(C, method)
            assert s.shape[0] == A.shape[0]
            assert set(np.unique(s)) <= {0, 1}
            assert 0 < s.sum() < A.shape[0]
            assert _valid_splitting(C, s)

    def test_rs_matches_greedy_quality(self):
        # RS coarsens 1D Poisson to alternating C/F (n/2 coarse points)
        A = poisson((64,))
        C = classical_strength_of_connection(A, 0.25)
        s = split.RS(C)
        assert abs(s.sum() - 32) <= 1


class TestInterpolation:
    def test_direct_interpolation_gold(self):
        # reference interpolate.py:39-50 doctest
        A = poisson((5,))
        splitting = np.array([1, 0, 1, 0, 1], dtype=np.int32)
        P = to_scipy(direct_interpolation(A, A, splitting)).toarray()
        expected = np.array([[1., 0., 0.], [.5, .5, 0.], [0., 1., 0.],
                             [0., .5, .5], [0., 0., 1.]])
        np.testing.assert_allclose(P, expected)

    def test_classical_interpolation_gold(self):
        # reference interpolate.py:118-130 doctest
        A = poisson((5,))
        splitting = np.array([1, 0, 1, 0, 1], dtype=np.int32)
        P = to_scipy(classical_interpolation(A, A, splitting, 0.25)).toarray()
        expected = np.array([[1., 0., 0.], [.5, .5, 0.], [0., 1., 0.],
                             [0., .5, .5], [0., 0., 1.]])
        np.testing.assert_allclose(P, expected)

    def test_injection_gold(self):
        A = poisson((5,))
        splitting = np.array([1, 0, 1, 0, 1], dtype=np.int32)
        P = to_scipy(injection_interpolation(A, splitting)).toarray()
        expected = np.array([[1., 0., 0.], [0., 0., 0.], [0., 1., 0.],
                             [0., 0., 0.], [0., 0., 1.]])
        np.testing.assert_allclose(P, expected)

    def test_one_point_gold(self):
        A = poisson((5,))
        splitting = np.array([1, 0, 1, 0, 1], dtype=np.int32)
        P = to_scipy(one_point_interpolation(A, A, splitting)).toarray()
        # each F row has a single 1 at a neighboring C column
        np.testing.assert_allclose(P.sum(axis=1), np.ones(5))
        assert (P[0] == [1, 0, 0]).all() and (P[4] == [0, 0, 1]).all()

    def test_direct_vs_scipy_gold_random_splitting(self):
        """Dense gold re-implementation of direct interpolation."""
        A = poisson((8, 8))
        C = classical_strength_of_connection(A, 0.25)
        s = split.RS(C)
        P = to_scipy(direct_interpolation(A, C, s)).toarray()
        Ad = to_scipy(A).toarray()
        Cs = to_scipy(C).tocsr()
        n = Ad.shape[0]
        cmap = np.cumsum(s) - s
        for i in range(n):
            if s[i] == 1:
                row = np.zeros(P.shape[1])
                row[cmap[i]] = 1
                np.testing.assert_allclose(P[i], row, atol=1e-14)
                continue
            nbrs = Cs.indices[Cs.indptr[i]:Cs.indptr[i + 1]]
            nbrs = nbrs[(nbrs != i)]
            strongC = [j for j in nbrs if s[j] == 1]
            sx = {j: Ad[i, j] for j in nbrs}
            ssn = sum(v for j, v in sx.items() if s[j] == 1 and v < 0)
            ssp = sum(v for j, v in sx.items() if s[j] == 1 and v > 0)
            offd = [Ad[i, j] for j in range(n) if j != i and Ad[i, j] != 0]
            san = sum(v for v in offd if v < 0)
            sap = sum(v for v in offd if v > 0)
            diag = Ad[i, i]
            alpha = san / ssn if ssn != 0 else 0.0
            if ssp == 0:
                diag += sap
                beta = 0.0
            else:
                beta = sap / ssp
            row = np.zeros(P.shape[1])
            for j in strongC:
                coeff = -alpha / diag if Ad[i, j] < 0 else -beta / diag
                row[cmap[j]] = coeff * Ad[i, j]
            np.testing.assert_allclose(P[i], row, atol=1e-12)


class TestRugeStubenSolver:
    def test_poisson_2d_convergence(self):
        # reference test_classical.py:156-182 asserts factor < 0.20
        A = poisson((32, 32))
        ml = ruge_stuben_solver(A, max_coarse=40)
        n = A.shape[0]
        b = jnp.zeros((n,), A.dtype)
        x0 = jnp.asarray(np.random.default_rng(0).standard_normal(n))
        res = []
        ml.solve(b, x0=x0, maxiter=20, tol=1e-12, residuals=res)
        res = np.asarray(res)
        factor = (res[-1] / res[0]) ** (1.0 / (len(res) - 1))
        assert factor < 0.20

    def test_poisson_1d_direct_interp(self):
        A = poisson((128,))
        ml = ruge_stuben_solver(A, interpolation="direct", max_coarse=16)
        b = jnp.zeros((128,), A.dtype)
        x0 = jnp.asarray(np.random.default_rng(1).standard_normal(128))
        res = []
        ml.solve(b, x0=x0, maxiter=20, tol=1e-12, residuals=res)
        res = np.asarray(res)
        factor = (res[-1] / res[0]) ** (1.0 / (len(res) - 1))
        assert factor < 0.20

    def test_cf_variants_converge(self):
        A = poisson((16, 16))
        for CF in ["PMIS", "CLJPc"]:
            ml = ruge_stuben_solver(A, CF=CF, max_coarse=20)
            b = jnp.zeros((256,), A.dtype)
            x0 = jnp.asarray(np.random.default_rng(2).standard_normal(256))
            res = []
            ml.solve(b, x0=x0, maxiter=25, tol=1e-10, residuals=res)
            res = np.asarray(res)
            factor = (res[-1] / res[0]) ** (1.0 / (len(res) - 1))
            assert factor < 0.75, (CF, factor)


class TestAIR:
    def test_two_level_exactness_1d_advection(self):
        # reference test_air.py:10-51: lAIR gives an exact 2-level solve
        # for bidiagonal upwind advection
        n = 64
        A = sp.diags_array([np.ones(n), -np.ones(n - 1)],
                           offsets=[0, -1]).tocsr()
        ml = air_solver(from_scipy(A), max_coarse=8)
        b = np.zeros(n)
        res = []
        ml.solve(b, x0=np.random.default_rng(2).standard_normal(n),
                 maxiter=4, tol=1e-14, residuals=res)
        assert res[1] < 1e-12

    def test_advection_2d_converges(self):
        A, rhs = advection_2d((12, 12))
        ml = air_solver(A, max_coarse=20)
        res = []
        ml.solve(jnp.asarray(rhs), maxiter=30, tol=1e-10, residuals=res)
        assert res[-1] / res[0] < 1e-8

    def test_local_air_gold(self):
        # reference interpolate.py local_air doctest (1D Poisson, 5 pts)
        A = poisson((5,))
        splitting = np.array([1, 0, 1, 0, 1], dtype=np.int32)
        R = to_scipy(local_air(A, splitting)).toarray()
        expected = np.array([[1., .5, 0., 0., 0.],
                             [0., .5, 1., .5, 0.],
                             [0., 0., 0., .5, 1.]])
        np.testing.assert_allclose(R, expected, atol=1e-12)


class TestCR:
    def test_cr_splitting_valid(self):
        from pyamg_tpu.classical.cr import CR
        A = poisson((10, 10))
        s = CR(A)
        assert s.shape[0] == 100
        assert set(np.unique(s)) <= {0, 1}
        assert 0 < s.sum() < 100

    def test_binormalize(self):
        # Livne-Golub binormalization equalizes the scaled row 2-norms
        # (reference cr.py:221 docstring "attempt to create unit l1 norm
        # rows"; the iteration actually drives x_i (Bx)_i to a constant)
        from pyamg_tpu.classical.cr import binormalize
        A = poisson((10,))
        C = to_scipy(binormalize(A)).toarray()
        norms = np.linalg.norm(C, axis=1)
        assert norms.std() / norms.mean() < 0.1


def test_air_use_gmres_local_solves():
    """lAIR with batched dense-GMRES local solves (reference
    ``air.h:212-328`` + ``krylov.h:214`` dense_GMRES path)."""
    from pyamg_tpu.gallery import advection_2d
    from pyamg_tpu.classical.air import air_solver
    from pyamg_tpu.sparse.matrix import to_scipy
    A, b = advection_2d((12, 12))
    ml = air_solver(A, interpolation="one_point",
                    restrict=("air", {"use_gmres": True, "maxiter": 8}))
    As = to_scipy(A)
    x = ml.solve(jnp.asarray(b), maxiter=30, tol=1e-10)
    r = np.linalg.norm(b - As @ np.asarray(x)) / np.linalg.norm(b)
    assert r < 1e-8


class TestNativeInterpolationParity:
    """Native O(nnz*W) classical-interpolation kernels vs the vectorized
    numpy twin (the gold), mirroring the reference's kernel-vs-gold
    discipline (SURVEY.md §4.1)."""

    def _mats(self, seed=0, n=30):
        import scipy.sparse as sp
        from pyamg_tpu.gallery import poisson
        from pyamg_tpu.sparse.matrix import from_scipy, to_scipy
        rng = np.random.default_rng(seed)
        A1 = poisson((n, n))
        # unstructured nonsymmetric-ish SPD-perturbed matrix
        S = to_scipy(A1).tolil()
        idx = rng.integers(0, n * n, size=4 * n)
        for i, j in zip(idx[::2], idx[1::2]):
            S[int(i), int(j)] = rng.standard_normal() * 0.3
        A2 = from_scipy(S.tocsr())
        return [A1, A2]

    def test_native_matches_numpy_twin(self, monkeypatch):
        from pyamg_tpu import _native
        from pyamg_tpu.classical import interpolate as itp
        from pyamg_tpu.classical.split import split_dispatch
        from pyamg_tpu.strength import classical_strength_of_connection
        from pyamg_tpu.sparse.matrix import to_scipy
        assert _native.get_lib() is not None
        for A in self._mats():
            C = classical_strength_of_connection(A, theta=0.25)
            split = np.asarray(split_dispatch(C, "RS"))
            for modified in (True, False):
                P_nat = itp.classical_interpolation(
                    A, C, split, modified=modified)
                with monkeypatch.context() as m:
                    m.setattr(_native, "classical_interpolation_ell",
                              lambda *a, **k: None)
                    m.setattr(_native, "remove_strong_ff_ell",
                              lambda *a, **k: None)
                    P_np = itp.classical_interpolation(
                        A, C, split, modified=modified)
                D = (to_scipy(P_nat) - to_scipy(P_np)).tocsr()
                assert abs(D).max() < 1e-12 if D.nnz else True

    def test_native_ff_matches_numpy_twin(self, monkeypatch):
        from pyamg_tpu import _native
        from pyamg_tpu.classical import interpolate as itp
        from pyamg_tpu.classical.split import split_dispatch
        from pyamg_tpu.strength import classical_strength_of_connection
        from pyamg_tpu.sparse.matrix import to_scipy
        for A in self._mats(seed=3):
            C = classical_strength_of_connection(A, theta=0.25)
            split = np.asarray(split_dispatch(C, "RS"))
            C_nat = itp.remove_strong_FF_connections(A, C, split)
            with monkeypatch.context() as m:
                m.setattr(_native, "remove_strong_ff_ell",
                          lambda *a, **k: None)
                C_np = itp.remove_strong_FF_connections(A, C, split)
            D = (to_scipy(C_nat) - to_scipy(C_np)).tocsr()
            assert abs(D).max() < 1e-14 if D.nnz else True


def test_air_filtered_operator_complexity():
    """Per-level operator filtering + PMIS bounds lAIR complexity
    (VERDICT r3 weak #7): OC <= 2 on 2D upwind advection with the same
    convergence as the unfiltered default (reference filtering knob:
    ``/root/reference/pyamg/classical/air.py:100-133``)."""
    import jax.numpy as jnp
    from pyamg_tpu.gallery import advection_2d
    from pyamg_tpu.classical import air_solver
    from pyamg_tpu.sparse.matrix import to_scipy

    A64, rhs = advection_2d((64, 64))
    S = to_scipy(A64)
    b = np.asarray(rhs, np.float64)
    ml = air_solver(A64.astype(jnp.float32), CF="PMIS",
                    filter_operator=(False, 0.1))
    assert float(ml.operator_complexity()) <= 2.05
    res = []
    x = ml.solve_refined(b, A_fine=S, tol=1e-9, accel="gmres",
                         inner_maxiter=40, max_outer=20, residuals=res)
    true = np.linalg.norm(b - S @ x) / np.linalg.norm(b)
    assert true < 1e-9
    assert len(res) - 1 <= 4
