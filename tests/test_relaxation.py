"""Smoother gold tests (reference pattern: test_relaxation.py gold loops)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from pyamg_tpu.sparse import from_scipy, bell_from_scipy
from pyamg_tpu.gallery import poisson
from pyamg_tpu.relaxation import relaxation as rx
from pyamg_tpu.relaxation.chebyshev import (
    chebyshev_polynomial_coefficients, mls_polynomial_coefficients)


def gold_jacobi(A, x, b, omega):
    D = A.diagonal()
    return x + omega * (b - A @ x) / D


def gold_gs_colored(A, x, b, colors, order):
    """Sequential GS in colored order — the exact iterate our multicolor
    sweep must reproduce."""
    Ad = A.toarray()
    D = A.diagonal()
    x = x.copy()
    for c in order:
        idx = np.where(colors == c)[0]
        r = b - Ad @ x
        x[idx] = x[idx] + r[idx] / D[idx]
    return x


class TestJacobi:
    def test_jacobi_gold(self):
        A = poisson((10, 10), format="csr")
        rng = np.random.default_rng(0)
        x = rng.standard_normal(100)
        b = rng.standard_normal(100)
        got = rx.jacobi(from_scipy(A), jnp.asarray(x), jnp.asarray(b),
                        iterations=3, omega=0.9)
        gold = x.copy()
        for _ in range(3):
            gold = gold_jacobi(A, gold, b, 0.9)
        np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-12)

    def test_jacobi_reduces_energy(self):
        A = poisson((50,))
        b = jnp.zeros(50)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(50))
        x2 = rx.jacobi(A, x, b, iterations=10, omega=2.0 / 3.0)
        assert float(jnp.linalg.norm(x2)) < 0.5 * float(jnp.linalg.norm(x))

    def test_jacobi_indexed(self):
        A = poisson((30,), format="csr")
        rng = np.random.default_rng(2)
        x = rng.standard_normal(30)
        b = rng.standard_normal(30)
        idx = np.arange(0, 30, 2)
        got = rx.jacobi_indexed(from_scipy(A), jnp.asarray(x),
                                jnp.asarray(b), jnp.asarray(idx))
        gold = gold_jacobi(A, x, b, 1.0)
        expect = x.copy()
        expect[idx] = gold[idx]
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12)

    def test_cf_fc_jacobi(self):
        A = poisson((20,), format="csr")
        rng = np.random.default_rng(3)
        x = rng.standard_normal(20)
        b = rng.standard_normal(20)
        C = jnp.asarray(np.arange(0, 20, 2))
        F = jnp.asarray(np.arange(1, 20, 2))
        xc = rx.cf_jacobi(from_scipy(A), jnp.asarray(x), jnp.asarray(b), C, F)
        xf = rx.fc_jacobi(from_scipy(A), jnp.asarray(x), jnp.asarray(b), C, F)
        # gold: two masked jacobi passes
        g = gold_jacobi(A, x, b, 1.0)
        e1 = x.copy(); e1[::2] = g[::2]
        g2 = gold_jacobi(A, e1, b, 1.0)
        e1[1::2] = g2[1::2]
        np.testing.assert_allclose(np.asarray(xc), e1, rtol=1e-12)
        e2 = x.copy(); e2[1::2] = g[1::2]
        g3 = gold_jacobi(A, e2, b, 1.0)
        e2[::2] = g3[::2]
        np.testing.assert_allclose(np.asarray(xf), e2, rtol=1e-12)


class TestGaussSeidel:
    def test_multicolor_gs_matches_colored_sequential(self):
        A = poisson((12, 12), format="csr")
        Ad = from_scipy(A)
        colors, nc = rx.make_coloring(Ad)
        rng = np.random.default_rng(4)
        x = rng.standard_normal(144)
        b = rng.standard_normal(144)
        got = rx.gauss_seidel(Ad, jnp.asarray(x), jnp.asarray(b),
                              colors=colors, ncolors=nc)
        gold = gold_gs_colored(A, x, b, np.asarray(colors), range(nc))
        np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-11)

    def test_gs_convergence_on_poisson(self):
        # smoother quality: symmetric GS reduces residual on Poisson
        A = poisson((8, 8), format="csr")
        Ad = from_scipy(A)
        b = jnp.zeros(64)
        x = jnp.asarray(np.random.default_rng(5).standard_normal(64))
        r0 = float(jnp.linalg.norm(x))
        x = rx.gauss_seidel(Ad, x, b, iterations=20, sweep="symmetric")
        assert float(jnp.linalg.norm(x)) < 0.2 * r0

    def test_coloring_is_proper(self):
        A = poisson((15, 17), format="csr")
        Ad = from_scipy(A)
        colors, nc = rx.make_coloring(Ad)
        c = np.asarray(colors)
        Ac = A.tocoo()
        for i, j in zip(Ac.row, Ac.col):
            if i != j:
                assert c[i] != c[j]
        assert nc <= 5  # 5-point stencil should 2-color (plus slack)


class TestPolynomial:
    def test_polynomial_richardson(self):
        A = poisson((25,), format="csr")
        rng = np.random.default_rng(6)
        x = rng.standard_normal(25)
        b = rng.standard_normal(25)
        got = rx.polynomial(from_scipy(A), jnp.asarray(x), jnp.asarray(b),
                            coefficients=[0.5])
        gold = x + 0.5 * (b - A @ x)
        np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-12)

    def test_polynomial_quadratic_gold(self):
        A = poisson((25,), format="csr")
        rng = np.random.default_rng(7)
        x = rng.standard_normal(25)
        b = rng.standard_normal(25)
        coef = [0.1, -0.2, 0.7]
        got = rx.polynomial(from_scipy(A), jnp.asarray(x), jnp.asarray(b),
                            coefficients=coef)
        r = b - A @ x
        h = coef[0] * r
        for c in coef[1:]:
            h = c * r + A @ h
        np.testing.assert_allclose(np.asarray(got), x + h, rtol=1e-12)

    def test_chebyshev_smooths(self):
        A = poisson((40,), format="csr")
        Ad = from_scipy(A)
        b = jnp.zeros(40)
        x = jnp.asarray(np.random.default_rng(8).standard_normal(40))
        x2 = rx.chebyshev(Ad, x, b, iterations=3)
        assert float(jnp.linalg.norm(x2)) < 0.6 * float(jnp.linalg.norm(x))

    def test_coefficients_match_reference_doctests(self):
        np.testing.assert_allclose(
            chebyshev_polynomial_coefficients(1.0, 2.0, 3),
            [-0.32323232, 1.45454545, -2.12121212, 1.0], rtol=1e-6)
        mls = mls_polynomial_coefficients(2.0, 2)
        np.testing.assert_allclose(
            mls[0], [6.4, -48., 144., -220., 180., -75.8, 14.5], rtol=1e-10)
        np.testing.assert_allclose(mls[1], [1.4472136, 0.5527864], rtol=1e-6)


class TestBlockSmoothers:
    def test_block_jacobi_blocksize1_equals_jacobi(self):
        A = poisson((30,), format="csr")
        Ab = sp.bsr_matrix(A, blocksize=(1, 1))
        rng = np.random.default_rng(9)
        x = rng.standard_normal(30)
        b = rng.standard_normal(30)
        got = rx.block_jacobi(bell_from_scipy(Ab), jnp.asarray(x),
                              jnp.asarray(b), omega=0.8)
        gold = gold_jacobi(A, x, b, 0.8)
        np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-12)

    def test_block_jacobi_2x2_gold(self):
        A = sp.bsr_matrix(poisson((20,), format="csr"), blocksize=(2, 2))
        rng = np.random.default_rng(10)
        x = rng.standard_normal(20)
        b = rng.standard_normal(20)
        got = rx.block_jacobi(bell_from_scipy(A), jnp.asarray(x),
                              jnp.asarray(b))
        # gold: x + blockdiag(A)^-1 (b - Ax)
        Ad = A.toarray()
        r = b - Ad @ x
        gold = x.copy()
        for i in range(10):
            Dblk = Ad[2*i:2*i+2, 2*i:2*i+2]
            gold[2*i:2*i+2] += np.linalg.solve(Dblk, r[2*i:2*i+2])
        np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-11)

    def test_block_jacobi_indexed_gold(self):
        A = sp.bsr_matrix(poisson((20,), format="csr"), blocksize=(2, 2))
        rng = np.random.default_rng(14)
        x = rng.standard_normal(20)
        b = rng.standard_normal(20)
        idx = np.array([0, 2, 5, 7])
        got = rx.block_jacobi_indexed(bell_from_scipy(A), jnp.asarray(x),
                                      jnp.asarray(b), jnp.asarray(idx))
        Ad = A.toarray()
        r = b - Ad @ x
        gold = x.copy()
        for i in idx:
            Dblk = Ad[2*i:2*i+2, 2*i:2*i+2]
            gold[2*i:2*i+2] += np.linalg.solve(Dblk, r[2*i:2*i+2])
        np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-11)

    def test_cf_fc_block_jacobi_gold(self):
        A = sp.bsr_matrix(poisson((24,), format="csr"), blocksize=(2, 2))
        Ab = bell_from_scipy(A)
        rng = np.random.default_rng(15)
        x = rng.standard_normal(24)
        b = rng.standard_normal(24)
        C = jnp.asarray(np.arange(0, 12, 2))
        F = jnp.asarray(np.arange(1, 12, 2))

        def masked_bj(x, idx):
            Ad = A.toarray()
            r = b - Ad @ np.asarray(x)
            out = np.asarray(x).copy()
            for i in np.asarray(idx):
                Dblk = Ad[2*i:2*i+2, 2*i:2*i+2]
                out[2*i:2*i+2] += np.linalg.solve(Dblk, r[2*i:2*i+2])
            return out

        got = rx.cf_block_jacobi(Ab, jnp.asarray(x), jnp.asarray(b), C, F)
        gold = masked_bj(masked_bj(x, C), F)
        np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-11)
        got = rx.fc_block_jacobi(Ab, jnp.asarray(x), jnp.asarray(b), C, F)
        gold = masked_bj(masked_bj(x, F), C)
        np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-11)

    def test_block_gauss_seidel_reduces(self):
        A = sp.bsr_matrix(poisson((30,), format="csr"), blocksize=(2, 2))
        Ab = bell_from_scipy(A)
        b = jnp.zeros(30)
        x = jnp.asarray(np.random.default_rng(11).standard_normal(30))
        x2 = rx.block_gauss_seidel(Ab, x, b, iterations=10)
        assert float(jnp.linalg.norm(x2)) < 0.3 * float(jnp.linalg.norm(x))


class TestNE:
    def test_jacobi_ne_reduces_residual(self):
        A = poisson((25,), format="csr")
        Ad = from_scipy(A)
        rng = np.random.default_rng(12)
        b = jnp.asarray(rng.standard_normal(25))
        x = jnp.zeros(25)
        # Cimmino iteration needs omega < 2/rho(D^-1 A A^T) (~0.75 here)
        x = rx.jacobi_ne(Ad, x, b, iterations=30, omega=0.5)
        r0 = float(jnp.linalg.norm(b))
        r = float(jnp.linalg.norm(b - Ad.mv(x)))
        assert r < 0.9 * r0

    def test_schwarz_exact_on_full_domain(self):
        # one subdomain covering everything = direct solve
        A = poisson((12,), format="csr")
        Ad = from_scipy(A)
        rng = np.random.default_rng(13)
        b = rng.standard_normal(12)
        sub = jnp.asarray(np.arange(12)[None, :])
        x = rx.schwarz(Ad, jnp.zeros(12), jnp.asarray(b), sub)
        gold = np.linalg.solve(A.toarray(), b)
        np.testing.assert_allclose(np.asarray(x), gold, rtol=1e-10)


def test_strength_based_schwarz_smoother():
    """strength_based_schwarz (reference smoothing.py:531): subdomains
    from the kept strength matrix C; solver converges on 2D Poisson."""
    import jax.numpy as jnp
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu.sparse.matrix import to_scipy
    A = poisson((20, 20))
    ml = smoothed_aggregation_solver(
        A, max_coarse=30, keep=True,
        presmoother=("strength_based_schwarz", {}),
        postsmoother=("strength_based_schwarz", {}))
    b = np.random.default_rng(3).standard_normal(A.shape[0])
    res = []
    x = ml.solve(b, tol=1e-8, maxiter=30, residuals=res)
    rel = np.linalg.norm(b - to_scipy(A) @ np.asarray(x)) \
        / np.linalg.norm(b)
    assert rel < 1e-7, (rel, len(res))
    # without keep=True it falls back to A's pattern and still works
    ml2 = smoothed_aggregation_solver(
        A, max_coarse=30,
        presmoother=("strength_based_schwarz", {}),
        postsmoother=("strength_based_schwarz", {}))
    x2 = ml2.solve(b, tol=1e-8, maxiter=30)
    rel2 = np.linalg.norm(b - to_scipy(A) @ np.asarray(x2)) \
        / np.linalg.norm(b)
    assert rel2 < 1e-7, rel2
