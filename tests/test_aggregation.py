"""SA end-to-end convergence tests (reference
``aggregation/tests/test_aggregation.py`` thresholds, BASELINE.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyamg_tpu.sparse import from_scipy, to_scipy
from pyamg_tpu.gallery import poisson
from pyamg_tpu.aggregation import (
    smoothed_aggregation_solver, standard_aggregation, naive_aggregation,
    fit_candidates)
from pyamg_tpu.strength import symmetric_strength_of_connection


def conv_factor(residuals):
    """Geometric-mean convergence factor (reference test idiom)."""
    r = np.asarray(residuals)
    r = r[r > 0]
    return (r[-1] / r[0]) ** (1.0 / max(len(r) - 1, 1))


class TestAggregationValidity:
    def test_standard_aggregation_covers(self):
        A = poisson((20, 20))
        C = symmetric_strength_of_connection(A)
        AggOp, Cpts = standard_aggregation(C)
        # every node aggregated on a connected Poisson graph
        assert int(jnp.sum(AggOp.row_nnz)) == 400
        # each aggregate nonempty, roots belong to own aggregate
        labels = np.asarray(AggOp.cols[:, 0])
        assert len(np.unique(labels)) == AggOp.shape[1]
        for k, r in enumerate(Cpts):
            assert labels[r] == k
        # coarsening ratio sane for MIS-2 (between ~4x and ~16x)
        assert 400 / 16 <= AggOp.shape[1] <= 400 / 3

    def test_naive_aggregation_covers(self):
        A = poisson((15, 15))
        C = symmetric_strength_of_connection(A)
        AggOp, Cpts = naive_aggregation(C)
        assert int(jnp.sum(AggOp.row_nnz)) == 225

    def test_metis_aggregation_covers(self):
        # runs pymetis when installed, balanced-Lloyd fallback otherwise
        from pyamg_tpu.aggregation import metis_aggregation
        A = poisson((15, 15))
        C = symmetric_strength_of_connection(A)
        AggOp, _ = metis_aggregation(C, ratio=0.1)
        assert int(jnp.sum(AggOp.row_nnz)) == 225
        labels = np.asarray(AggOp.cols[:, 0])
        assert len(np.unique(labels)) == AggOp.shape[1]

    def test_metis_sa_solver_converges(self):
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        A = poisson((20, 20))
        ml = smoothed_aggregation_solver(A, aggregate=("metis", {}),
                                         max_coarse=20)
        rng = np.random.default_rng(7)
        b = jnp.asarray(rng.standard_normal(400))
        res = []
        ml.solve(b, maxiter=20, tol=1e-10, residuals=res)
        assert conv_factor(res) < 0.6


class TestFitCandidates:
    def test_single_candidate(self):
        # 4 nodes, 2 aggregates of 2; B = ones
        from pyamg_tpu.sparse import ELL
        cols = jnp.asarray([[0], [0], [1], [1]], jnp.int32)
        vals = jnp.ones((4, 1))
        AggOp = ELL(cols, vals, jnp.ones(4, jnp.int32), (4, 2))
        B = jnp.ones((4, 1))
        T, Bc = fit_candidates(AggOp, B)
        Td = to_scipy(T).toarray()
        s = 1 / np.sqrt(2)
        np.testing.assert_allclose(
            Td, [[s, 0], [s, 0], [0, s], [0, s]], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(Bc),
                                   [[np.sqrt(2)], [np.sqrt(2)]], rtol=1e-12)

    def test_unaggregated_node_zero_row(self):
        # reference tentative.py doctest: node 1 unaggregated -> zero row
        from pyamg_tpu.sparse import ELL
        cols = jnp.asarray([[0], [0], [0]], jnp.int32)
        vals = jnp.asarray([[1.0], [0.0], [1.0]])
        AggOp = ELL(cols, vals, jnp.asarray([1, 0, 1], jnp.int32), (3, 1))
        B = jnp.ones((3, 1))
        T, Bc = fit_candidates(AggOp, B)
        Td = to_scipy(T).toarray()
        s = 1 / np.sqrt(2)
        np.testing.assert_allclose(Td, [[s], [0], [s]], atol=1e-14)

    def test_two_candidates_qr_invariant(self):
        from pyamg_tpu.sparse import ELL
        rng = np.random.default_rng(0)
        n, nagg = 12, 3
        labels = np.repeat(np.arange(nagg), 4)
        cols = jnp.asarray(labels[:, None], jnp.int32)
        AggOp = ELL(cols, jnp.ones((n, 1)), jnp.ones(n, jnp.int32),
                    (n, nagg))
        B = jnp.asarray(rng.standard_normal((n, 2)))
        T, Bc = fit_candidates(AggOp, B)
        # invariant: T @ Bc == B
        Td = to_scipy(T).toarray()
        np.testing.assert_allclose(Td @ np.asarray(Bc), np.asarray(B),
                                   atol=1e-12)
        # orthonormal columns within each aggregate
        QtQ = Td.T @ Td
        np.testing.assert_allclose(QtQ, np.eye(QtQ.shape[0]), atol=1e-12)


class TestSAConvergence:
    def test_sa_1d_poisson_standalone(self):
        A = poisson((500,))
        b = jnp.zeros((500,))
        x0 = jnp.asarray(np.random.default_rng(0).standard_normal(500))
        ml = smoothed_aggregation_solver(A, max_coarse=10)
        res = []
        x = ml.solve(b, x0=x0, maxiter=20, tol=1e-12, residuals=res)
        # reference asserts < 0.4 for SA-jacobi on 1D Poisson
        assert conv_factor(res) < 0.4

    def test_sa_2d_poisson_standalone(self):
        A = poisson((60, 60))
        n = A.shape[0]
        b = jnp.zeros((n,))
        x0 = jnp.asarray(np.random.default_rng(1).standard_normal(n))
        ml = smoothed_aggregation_solver(A, max_coarse=10)
        res = []
        ml.solve(b, x0=x0, maxiter=20, tol=1e-12, residuals=res)
        # reference asserts < 0.42 on 2D Poisson 60x60
        assert conv_factor(res) < 0.42

    def test_sa_cg_acceleration(self):
        A = poisson((50, 50))
        n = A.shape[0]
        rng = np.random.default_rng(2)
        b = jnp.asarray(rng.standard_normal(n))
        ml = smoothed_aggregation_solver(A, max_coarse=10)
        res = []
        x = ml.solve(b, maxiter=60, tol=1e-10, accel="cg", residuals=res)
        assert res[-1] / res[0] < 1e-9
        # solution check
        As = to_scipy(ml.levels[0].A)
        r = np.asarray(b) - As @ np.asarray(x)
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-8
        # AMG-CG on Poisson should converge in ~10-25 iterations
        assert len(res) < 30

    def test_sa_hierarchy_shape(self):
        A = poisson((100, 100))
        ml = smoothed_aggregation_solver(A, max_coarse=10)
        assert len(ml.levels) >= 3
        assert ml.levels[-1].A.shape[0] <= 10 * 4  # near max_coarse
        oc = ml.operator_complexity()
        assert 1.0 < oc < 1.6  # reference: 1.338 on 2D Poisson (paper)

    def test_sa_nonsymmetric_mode(self):
        A = poisson((80,))
        ml = smoothed_aggregation_solver(A, symmetry="nonsymmetric",
                                         max_coarse=10)
        b = jnp.zeros(80)
        x0 = jnp.asarray(np.random.default_rng(3).standard_normal(80))
        res = []
        ml.solve(b, x0=x0, maxiter=20, tol=1e-12, residuals=res)
        assert conv_factor(res) < 0.6

    def test_sa_W_and_F_cycles(self):
        A = poisson((40, 40))
        n = A.shape[0]
        ml = smoothed_aggregation_solver(A, max_coarse=10)
        x0 = jnp.asarray(np.random.default_rng(4).standard_normal(n))
        for cyc in ("V", "W", "F", "AMLI"):
            res = []
            ml.solve(jnp.zeros(n), x0=x0, maxiter=10, tol=1e-12,
                     residuals=res, cycle=cyc)
            assert conv_factor(res) < 0.5, cyc

    def test_sa_smooth_options(self):
        A = poisson((30, 30))
        n = A.shape[0]
        x0 = jnp.asarray(np.random.default_rng(5).standard_normal(n))
        for smooth in [("jacobi", {"omega": 4.0 / 3.0}),
                       ("richardson", {"omega": 4.0 / 3.0}), None]:
            ml = smoothed_aggregation_solver(A, smooth=smooth, max_coarse=10)
            res = []
            ml.solve(jnp.zeros(n), x0=x0, maxiter=20, tol=1e-12,
                     residuals=res)
            assert conv_factor(res) < 0.9, smooth

    def test_sa_smoother_options(self):
        A = poisson((25, 25))
        n = A.shape[0]
        x0 = jnp.asarray(np.random.default_rng(6).standard_normal(n))
        for sm in [("gauss_seidel", {"sweep": "symmetric"}),
                   ("jacobi", {"omega": 4.0 / 3.0, "iterations": 2}),
                   ("chebyshev", {"degree": 3}),
                   ("sor", {"omega": 1.2})]:
            ml = smoothed_aggregation_solver(A, presmoother=sm,
                                             postsmoother=sm, max_coarse=10)
            res = []
            ml.solve(jnp.zeros(n), x0=x0, maxiter=20, tol=1e-12,
                     residuals=res)
            assert conv_factor(res) < 0.9, sm

    def test_coarse_solver_options(self):
        A = poisson((20, 20))
        n = A.shape[0]
        x0 = jnp.asarray(np.random.default_rng(7).standard_normal(n))
        for cs in ["pinv", "lu", "cholesky", ("gauss_seidel",
                                              {"iterations": 10})]:
            ml = smoothed_aggregation_solver(A, coarse_solver=cs,
                                             max_coarse=40)
            res = []
            ml.solve(jnp.zeros(n), x0=x0, maxiter=15, tol=1e-12,
                     residuals=res)
            assert conv_factor(res) < 0.7, cs


class TestMultiCandidate:
    """Scalar operator + multi-column B (T gets (1,K2) node blocks)."""

    def test_two_candidate_smoothers(self):
        # reference exercises K2=2 B on scalar A for every smoother
        # (pyamg/aggregation/tests/test_aggregation.py:165-181)
        A = poisson((20, 20))
        n = A.shape[0]
        B = np.ones((n, 2))
        B[:, 1] = np.arange(n)
        x0 = jnp.asarray(np.random.default_rng(3).standard_normal(n))
        for sm in [("jacobi", {}), ("richardson", {}), ("energy", {})]:
            ml = smoothed_aggregation_solver(A, B=B, smooth=sm)
            res = []
            ml.solve(jnp.zeros(n), x0=x0, maxiter=15, tol=1e-16,
                     residuals=res)
            assert conv_factor(res) < 0.5, (sm, conv_factor(res))


class TestEliminateLocal:
    def test_in_range_candidate_fully_eliminated(self):
        # a candidate already in range(T) must be zeroed by test 2
        # (reference pyamg/aggregation/adaptive.py:25)
        from pyamg_tpu.aggregation.adaptive import eliminate_local_candidates
        from pyamg_tpu.sparse.matrix import to_scipy
        A = poisson((20, 20))
        ml = smoothed_aggregation_solver(A, keep=True)
        l0 = ml.levels[0]
        xc = np.random.default_rng(1).standard_normal(l0.T.shape[1])
        xr = to_scipy(l0.T) @ xc
        out = eliminate_local_candidates(xr, l0.AggOp, l0.A, l0.T,
                                         thresh=1.0)
        assert np.linalg.norm(out) == 0.0

    def test_adaptive_with_elimination_converges(self):
        from pyamg_tpu.aggregation.adaptive import adaptive_sa_solver
        A = poisson((20, 20))
        n = A.shape[0]
        ml, work = adaptive_sa_solver(A, num_candidates=2,
                                      eliminate_local=(True, {"thresh": 1.0}))
        res = []
        x0 = jnp.asarray(np.random.default_rng(0).standard_normal(n))
        ml.solve(jnp.zeros(n), x0=x0, maxiter=20, tol=1e-16, residuals=res)
        assert conv_factor(res) < 0.35
