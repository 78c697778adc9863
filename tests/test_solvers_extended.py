"""Rootnode / energy / adaptive / pairwise / blackbox / evolution tests
(mirrors reference ``test_rootnode.py``, ``test_adaptive.py``,
``test_pairwise.py``, ``test_blackbox.py`` and the evolution cases of
``test_strength.py``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyamg_tpu.gallery import poisson, linear_elasticity
from pyamg_tpu.sparse import to_scipy, from_scipy
from pyamg_tpu.aggregation import smoothed_aggregation_solver


def conv_factor(res):
    res = np.asarray(res)
    return (res[-1] / res[0]) ** (1.0 / max(len(res) - 1, 1))


def run_solver(ml, n, seed=0, maxiter=20):
    b = jnp.zeros((n,), ml.levels[0].A.dtype)
    x0 = jnp.asarray(np.random.default_rng(seed).standard_normal(n))
    res = []
    ml.solve(b, x0=x0, maxiter=maxiter, tol=1e-12, residuals=res)
    return conv_factor(res)


class TestEnergySmoothing:
    def test_sa_energy_1d(self):
        # reference test_aggregation.py:165-172: factor < 0.4 (cg)
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        A = poisson((300,))
        ml = smoothed_aggregation_solver(A, smooth="energy", max_coarse=10)
        assert run_solver(ml, 300) < 0.4

    def test_sa_energy_gmres_1d(self):
        # reference: energy-gmres factor < 0.5
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        A = poisson((300,))
        ml = smoothed_aggregation_solver(
            A, smooth=("energy", {"krylov": "gmres"}), max_coarse=10)
        assert run_solver(ml, 300) < 0.5

    def test_sa_energy_2d(self):
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        A = poisson((24, 24))
        ml = smoothed_aggregation_solver(A, smooth="energy", max_coarse=30)
        assert run_solver(ml, 576) < 0.45

    def test_update_has_zero_constraint_violation(self):
        """Energy smoothing must preserve T @ Bc = Bf."""
        from pyamg_tpu.strength import symmetric_strength_of_connection
        from pyamg_tpu.aggregation.aggregate import standard_aggregation
        from pyamg_tpu.aggregation.tentative import fit_candidates
        from pyamg_tpu.aggregation.energy import (
            energy_prolongation_smoother)
        A = poisson((100,))
        C = symmetric_strength_of_connection(A)
        AggOp, _ = standard_aggregation(C)
        B = jnp.ones((100, 1))
        T, Bc = fit_candidates(AggOp, B)
        P = energy_prolongation_smoother(A, T, C, Bc, B)
        PB = to_scipy(P) @ np.asarray(Bc)
        TB = to_scipy(T) @ np.asarray(Bc)
        np.testing.assert_allclose(PB, TB, atol=1e-10)


class TestRootnode:
    def test_rootnode_1d(self):
        # reference test_rootnode.py:172-215 band 0.26-0.40
        from pyamg_tpu.aggregation import rootnode_solver
        A = poisson((300,))
        ml = rootnode_solver(A, max_coarse=10)
        assert run_solver(ml, 300) < 0.40

    def test_rootnode_2d(self):
        from pyamg_tpu.aggregation import rootnode_solver
        A = poisson((24, 24))
        ml = rootnode_solver(A, max_coarse=30)
        assert run_solver(ml, 576) < 0.45

    def test_rootnode_identity_at_cpts(self):
        from pyamg_tpu.aggregation import rootnode_solver
        A = poisson((100,))
        ml = rootnode_solver(A, max_coarse=10, keep=True)
        lvl = ml.levels[0]
        P = to_scipy(lvl.P).toarray()
        for j, c in enumerate(np.asarray(lvl.Cpts)):
            row = np.zeros(P.shape[1])
            row[j] = 1.0
            np.testing.assert_allclose(P[c], row, atol=1e-12)


class TestAdaptive:
    def test_adaptive_poisson(self):
        # reference test_adaptive.py::test_poisson asserts
        # conv(aSA) < 1.2 * conv(SA with constant B)
        from pyamg_tpu.aggregation import (adaptive_sa_solver,
                                           smoothed_aggregation_solver)
        A = poisson((24, 24))
        # a deep trial hierarchy (small max_coarse) is what makes the
        # bootstrapped candidate globally smooth
        ml, work = adaptive_sa_solver(A, num_candidates=1,
                                      candidate_iters=6, max_coarse=10)
        assert work > 0
        sa = smoothed_aggregation_solver(A, max_coarse=10)
        conv_asa = run_solver(ml, 576)
        conv_sa = run_solver(sa, 576)
        assert conv_asa < max(1.2 * conv_sa, 0.35), (conv_asa, conv_sa)


class TestPairwise:
    def test_pairwise_poisson(self):
        from pyamg_tpu.aggregation import pairwise_solver
        A = poisson((100,))
        ml = pairwise_solver(A, max_coarse=8)
        # unsmoothed aggregation: weak but convergent V-cycles
        assert run_solver(ml, 100, maxiter=30) < 0.9

    def test_pairwise_aggregation_shapes(self):
        from pyamg_tpu.aggregation import pairwise_aggregation
        A = poisson((60,))
        AggOp, Cpts = pairwise_aggregation(A, matchings=2)
        assert AggOp.shape[0] == 60
        assert 10 <= AggOp.shape[1] <= 30


class TestEvolutionStrength:
    def test_evolution_poisson_pattern(self):
        from pyamg_tpu.strength_evolution import (
            evolution_strength_of_connection)
        A = poisson((12, 12))
        S = evolution_strength_of_connection(A, epsilon=4.0, k=2)
        Ss = to_scipy(S).tocsr()
        assert Ss.shape == (144, 144)
        d = Ss.diagonal()
        # diagonal kept, values row-scaled into (0, 1]
        assert (Ss.data <= 1.0 + 1e-12).all()
        assert (Ss.data >= 0).all()
        # symmetric measure
        assert abs(Ss - Ss.T).max() < 1e-12

    def test_evolution_sa_convergence(self):
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        A = poisson((24, 24))
        ml = smoothed_aggregation_solver(
            A, strength=("evolution", {"k": 2, "epsilon": 4.0}),
            max_coarse=30)
        assert run_solver(ml, 576) < 0.45

    def test_evolution_multi_candidate(self):
        from pyamg_tpu.strength_evolution import (
            evolution_strength_of_connection)
        A = poisson((10, 10))
        B = np.ones((100, 2))
        B[:, 1] = np.arange(100)
        S = evolution_strength_of_connection(A, B=B, epsilon=4.0, k=2)
        assert to_scipy(S).nnz > 100


class TestBlackbox:
    def test_blackbox_poisson(self):
        import pyamg_tpu
        A = poisson((20, 20))
        b = np.ones(400)
        res = []
        x = pyamg_tpu.solve(A, b, verb=False, maxiter=400, tol=1e-5,
                            residuals=res)
        r = np.linalg.norm(b - to_scipy(A) @ np.asarray(x))
        assert r / np.linalg.norm(b) < 1e-4

    def test_solver_configuration(self):
        from pyamg_tpu.blackbox import solver_configuration
        A = poisson((15, 15))
        config = solver_configuration(A, verb=False)
        assert config["symmetry"] == "hermitian"
        assert config["strength"][0] == "evolution"

    def test_solver_reuse(self):
        import pyamg_tpu
        A = poisson((15, 15))
        b = np.ones(225)
        x, ml = pyamg_tpu.solve(A, b, verb=False, return_solver=True)
        x2 = pyamg_tpu.solve(A, 2 * b, verb=False, existing_solver=ml)
        r = np.linalg.norm(2 * b - to_scipy(A) @ np.asarray(x2))
        assert r / np.linalg.norm(2 * b) < 1e-4


class TestGraphExtras:
    def test_balanced_lloyd(self):
        from pyamg_tpu.graph import balanced_lloyd_cluster
        from pyamg_tpu.strength import symmetric_strength_of_connection
        A = poisson((12, 12))
        C = symmetric_strength_of_connection(A)
        cl, centers = balanced_lloyd_cluster(C, 12, seed=3)
        assert len(np.unique(cl[cl >= 0])) == 12
        assert (cl >= 0).all()
        sizes = np.bincount(cl, minlength=12)
        assert sizes.max() <= 12 * 6  # loosely balanced

    def test_symmetric_rcm(self):
        from pyamg_tpu.graph import symmetric_rcm
        A = poisson((30,))
        perm = symmetric_rcm(A)
        assert sorted(perm.tolist()) == list(range(30))
        # RCM on a path reduces to a monotone ordering: bandwidth 1
        As = to_scipy(A).toarray()[np.ix_(perm, perm)]
        nz = np.nonzero(As)
        assert np.abs(nz[0] - nz[1]).max() <= 2

    def test_kmeanspp_seed(self):
        from pyamg_tpu.graph import kmeanspp_seed
        from pyamg_tpu.strength import symmetric_strength_of_connection
        C = symmetric_strength_of_connection(poisson((10, 10)))
        seeds = kmeanspp_seed(C, 8, seed=0)
        assert len(np.unique(seeds)) == 8


def test_complex_sa_gauge_laplacian():
    """Complex-dtype SA hierarchy + CG (reference supports c64/c128
    throughout, instantiate.yml type matrix)."""
    from pyamg_tpu.gallery import gauge_laplacian
    A = gauge_laplacian(10, beta=0.1)
    ml = smoothed_aggregation_solver(A, max_coarse=8)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0]) + 1j * rng.standard_normal(A.shape[0])
    res = []
    ml.solve(b, maxiter=25, tol=1e-8, residuals=res, accel="cg")
    assert res[-1] / res[0] < 1e-7


def test_amli_cycle_converges():
    """AMLI cycle (reference multilevel.py:232-247) beats 0.35/iter on
    2-D Poisson."""
    A = poisson((24, 24))
    ml = smoothed_aggregation_solver(A, max_coarse=10)
    rng = np.random.default_rng(1)
    res = []
    ml.solve(rng.standard_normal(A.shape[0]), maxiter=12, tol=1e-10,
             cycle="AMLI", residuals=res)
    factor = (res[-1] / res[0]) ** (1.0 / (len(res) - 1))
    assert factor < 0.35


def test_3d_poisson_sa_cg():
    """BASELINE.json config: 3-D Poisson via SA-preconditioned CG."""
    A = poisson((12, 12, 12))
    ml = smoothed_aggregation_solver(A, max_coarse=40)
    rng = np.random.default_rng(2)
    res = []
    ml.solve(rng.standard_normal(A.shape[0]), maxiter=25, tol=1e-10,
             accel="cg", residuals=res)
    assert res[-1] / res[0] < 1e-9
    assert len(res) - 1 <= 15


def test_air_gmres_on_device_arrays():
    """Regression: AMG-preconditioned GMRES with a device-resident (f32)
    hierarchy — exercises the is_concrete trace-state guard (numpy twins
    must not run inside the gmres jit trace when the hierarchy arrives as
    closure constants)."""
    import jax
    from pyamg_tpu.gallery import advection_2d
    from pyamg_tpu.classical import air_solver
    A64, rhs = advection_2d((16, 16))
    ml = air_solver(A64.astype(jnp.float32))
    ml.to_device(jax.devices()[0])
    res = []
    ml.solve(np.asarray(rhs, np.float32), tol=1e-6, maxiter=8,
             accel="gmres", residuals=res)
    assert res[-1] / max(res[0], 1e-30) < 1e-5
