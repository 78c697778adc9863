"""Gold tests: ELL/BELL containers and ops vs scipy (SURVEY.md §4 pattern)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from pyamg_tpu.sparse import ELL, from_scipy, to_scipy, eye
from pyamg_tpu import ops
from pyamg_tpu.gallery import poisson, stencil_grid


def random_csr(n, m, density=0.1, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = sp.random(n, m, density=density, random_state=np.random.RandomState(seed),
                  format="csr", dtype=np.float64)
    A.data = rng.standard_normal(A.nnz)
    A = A.astype(dtype)
    A.sort_indices()
    return A


class TestRoundTrip:
    def test_csr_roundtrip(self):
        A = random_csr(50, 37, 0.15, seed=1)
        B = to_scipy(from_scipy(A))
        assert (abs(A - B) > 0).nnz == 0

    def test_poisson_matches_reference_values(self):
        A = poisson((4,))
        D = np.asarray(to_scipy(A).toarray())
        expect = np.array([[2., -1, 0, 0], [-1, 2, -1, 0],
                           [0, -1, 2, -1], [0, 0, -1, 2]])
        np.testing.assert_allclose(D, expect)

    def test_poisson_2d(self):
        A = to_scipy(poisson((2, 3)))
        expect = np.array([
            [4., -1, 0, -1, 0, 0], [-1, 4, -1, 0, -1, 0],
            [0, -1, 4, 0, 0, -1], [-1, 0, 0, 4, -1, 0],
            [0, -1, 0, -1, 4, -1], [0, 0, -1, 0, -1, 4]])
        np.testing.assert_allclose(A.toarray(), expect)

    def test_stencil_grid_vs_dense(self):
        sten = np.array([[0, -1, 0], [-1, 4.1, -1], [0, -1, 0]])
        A = to_scipy(stencil_grid(sten, (5, 7)))
        # brute-force gold
        n = 35
        G = np.zeros((n, n))
        for i in range(5):
            for j in range(7):
                r = i * 7 + j
                G[r, r] = 4.1
                for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                    ii, jj = i + di, j + dj
                    if 0 <= ii < 5 and 0 <= jj < 7:
                        G[r, ii * 7 + jj] = -1
        np.testing.assert_allclose(A.toarray(), G)

    def test_poisson_fe(self):
        A = to_scipy(poisson((3, 3), type="FE")).toarray()
        assert A[4, 4] == 8.0
        assert A[4, 0] == -1.0


class TestSpMV:
    @pytest.mark.parametrize("shape,density", [((40, 40), 0.2),
                                               ((63, 31), 0.1),
                                               ((128, 200), 0.05)])
    def test_spmv_random(self, shape, density):
        A = random_csr(*shape, density, seed=3)
        x = np.random.default_rng(7).standard_normal(shape[1])
        y = ops.spmv(from_scipy(A), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-12)

    def test_spmv_multirhs(self):
        A = random_csr(30, 20, 0.3, seed=5)
        X = np.random.default_rng(8).standard_normal((20, 4))
        Y = ops.spmv(from_scipy(A), jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(Y), A @ X, rtol=1e-12)

    def test_rspmv(self):
        A = random_csr(30, 20, 0.3, seed=6)
        x = np.random.default_rng(9).standard_normal(30)
        y = ops.rspmv(from_scipy(A), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), A.T @ x, rtol=1e-12)

    def test_diagonal(self):
        A = random_csr(25, 25, 0.3, seed=10)
        A = A + sp.eye(25) * 3.3
        A = sp.csr_matrix(A)
        d = ops.extract_diagonal(from_scipy(A))
        np.testing.assert_allclose(np.asarray(d), A.diagonal(), rtol=1e-12)

    def test_empty_rows(self):
        A = sp.csr_matrix((np.array([1.0]), np.array([2]),
                           np.array([0, 0, 1, 1, 1])), shape=(4, 4))
        x = np.arange(4.0)
        y = ops.spmv(from_scipy(A), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), A @ x)


class TestBSR:
    def test_bspmv(self):
        A = sp.bsr_matrix(random_csr(36, 24, 0.3, seed=11), blocksize=(3, 2))
        from pyamg_tpu.sparse import bell_from_scipy
        B = bell_from_scipy(A)
        x = np.random.default_rng(12).standard_normal(24)
        y = ops.bspmv(B, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-12)

    def test_bell_roundtrip(self):
        A = sp.bsr_matrix(random_csr(36, 24, 0.3, seed=13), blocksize=(2, 2))
        from pyamg_tpu.sparse import bell_from_scipy
        B = to_scipy(bell_from_scipy(A))
        assert (abs(sp.csr_matrix(A) - sp.csr_matrix(B)) > 1e-14).nnz == 0

    def test_btranspose(self):
        A = sp.bsr_matrix(random_csr(36, 24, 0.3, seed=14), blocksize=(3, 2))
        from pyamg_tpu.sparse import bell_from_scipy
        B = ops.btranspose(bell_from_scipy(A))
        assert B.blocksize == (2, 3)
        got = sp.csr_matrix(to_scipy(B))
        np.testing.assert_allclose(got.toarray(), A.T.toarray(), rtol=1e-12)

    def test_block_diag(self):
        A = sp.bsr_matrix(poisson((12,), format="csr"), blocksize=(2, 2))
        from pyamg_tpu.sparse import bell_from_scipy
        D = ops.extract_block_diagonal(bell_from_scipy(A))
        for i in range(6):
            np.testing.assert_allclose(
                np.asarray(D[i]), A.toarray()[2*i:2*i+2, 2*i:2*i+2])


class TestTranspose:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_transpose_random(self, seed):
        A = random_csr(40, 25, 0.15, seed=seed)
        At = to_scipy(ops.transpose(from_scipy(A)))
        assert (abs(At - A.T) > 1e-14).nnz == 0

    def test_transpose_complex_conjugate(self):
        A = random_csr(20, 30, 0.2, seed=4).astype(np.complex128)
        A.data = A.data + 1j * np.random.default_rng(5).standard_normal(A.nnz)
        AH = to_scipy(ops.transpose(from_scipy(A), conjugate=True))
        assert abs(AH - A.conj().T).max() < 1e-14


class TestSpGEMM:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_spgemm_random(self, seed):
        A = random_csr(30, 40, 0.15, seed=seed)
        B = random_csr(40, 25, 0.15, seed=seed + 100)
        C = to_scipy(ops.spgemm(from_scipy(A), from_scipy(B)))
        gold = A @ B
        gold.eliminate_zeros()
        assert abs(C - gold).max() < 1e-12

    def test_galerkin_triple_product(self):
        A = poisson((10, 10), format="csr")
        # simple injection P: every 2nd point
        n = 100
        nc = 50
        P = sp.csr_matrix((np.ones(nc), (np.arange(0, n, 2), np.arange(nc))),
                          shape=(n, nc))
        R = P.T.tocsr()
        gold = R @ A @ P
        Ad, Pd = from_scipy(A), from_scipy(P)
        Rd = ops.transpose(Pd)
        got = to_scipy(ops.spgemm(Rd, ops.spgemm(Ad, Pd)))
        assert abs(got - gold).max() < 1e-12

    def test_spgemm_identity(self):
        A = random_csr(20, 20, 0.2, seed=9)
        I = eye(20, dtype=jnp.float64)
        C = to_scipy(ops.spgemm(from_scipy(A), I))
        assert abs(C - A).max() < 1e-14

    def test_masked_spgemm(self):
        A = random_csr(25, 25, 0.25, seed=20)
        B = random_csr(25, 25, 0.25, seed=21)
        gold_full = (A @ B).toarray()
        # pattern = pattern of A (arbitrary mask)
        Ad, Bd = from_scipy(A), from_scipy(B)
        vals = ops.masked_spgemm(Ad, Bd, Ad.cols, Ad.valid_mask())
        S = ELL(Ad.cols, vals, Ad.row_nnz, (25, 25))
        got = to_scipy(S).toarray()
        mask = (A.toarray() != 0)
        np.testing.assert_allclose(got, gold_full * mask, atol=1e-12)


class TestArith:
    def test_add(self):
        A = random_csr(30, 30, 0.1, seed=30)
        B = random_csr(30, 30, 0.1, seed=31)
        C = to_scipy(ops.add(from_scipy(A), from_scipy(B)))
        assert abs(C - (A + B)).max() < 1e-14

    def test_add_scaled_identity(self):
        A = random_csr(30, 30, 0.1, seed=32)
        C = to_scipy(ops.add_scaled_identity(from_scipy(A), alpha=-2.0, beta=0.5))
        gold = sp.eye(30) * 0.5 - 2.0 * A
        assert abs(C - gold).max() < 1e-14

    def test_scale_rows_cols(self):
        A = random_csr(20, 25, 0.2, seed=33)
        d1 = np.random.default_rng(1).standard_normal(20)
        d2 = np.random.default_rng(2).standard_normal(25)
        got_r = to_scipy(ops.scale_rows(from_scipy(A), jnp.asarray(d1)))
        got_c = to_scipy(ops.scale_cols(from_scipy(A), jnp.asarray(d2)))
        assert abs(got_r - sp.diags(d1) @ A).max() < 1e-14
        assert abs(got_c - A @ sp.diags(d2)).max() < 1e-14

    def test_remove_diagonal(self):
        A = random_csr(20, 20, 0.3, seed=34) + sp.eye(20)
        A = sp.csr_matrix(A)
        C = to_scipy(ops.remove_diagonal(from_scipy(A)))
        gold = A - sp.diags(A.diagonal())
        gold.eliminate_zeros()
        assert abs(C - gold).max() < 1e-14

    def test_with_diagonal(self):
        A = random_csr(15, 15, 0.3, seed=35)
        d = np.random.default_rng(3).standard_normal(15)
        C = to_scipy(ops.with_diagonal(from_scipy(A), jnp.asarray(d)))
        gold = A - sp.diags(A.diagonal()) + sp.diags(d)
        assert abs(C - gold).max() < 1e-13


class TestDIA:
    """Banded fast path (DIA) equals the ELL gather path bitwise."""

    def test_dia_roundtrip_and_spmv(self):
        import numpy as np
        import jax.numpy as jnp
        from pyamg_tpu.gallery import poisson
        from pyamg_tpu.sparse.matrix import (dia_from_ell, ell_from_dia,
                                             to_scipy)
        from pyamg_tpu.ops.spmv import spmv, dia_spmv
        A = poisson((13, 7))
        D = dia_from_ell(A)
        assert D is not None and len(D.offsets) == 5
        x = jnp.asarray(np.random.default_rng(0).standard_normal(91))
        assert float(jnp.max(jnp.abs(spmv(A, x) - dia_spmv(D, x)))) == 0.0
        assert abs(to_scipy(ell_from_dia(D)) - to_scipy(A)).max() == 0.0

    def test_compress_stencils_preserves_solve(self):
        import numpy as np
        import jax.numpy as jnp
        from pyamg_tpu.gallery import poisson
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        A = poisson((16, 16))
        ml = smoothed_aggregation_solver(A, max_coarse=10)
        x0 = jnp.asarray(np.random.default_rng(1).standard_normal(256))
        res0 = []
        ml.solve(jnp.zeros(256), x0=x0, maxiter=8, tol=1e-12,
                 residuals=res0)
        ml.compress_stencils()
        res1 = []
        ml.solve(jnp.zeros(256), x0=x0, maxiter=8, tol=1e-12,
                 residuals=res1)
        np.testing.assert_allclose(res0, res1, rtol=1e-9)


class TestDedupParity:
    """Device (two-sort scatter-free) vs host dedup must agree exactly on
    structure and to rounding on values."""

    def test_dedup_rows_device_vs_host_fuzz(self):
        import numpy as np
        import jax.numpy as jnp
        from pyamg_tpu.ops.rowops import dedup_rows, dedup_rows_host
        rng = np.random.default_rng(7)
        for _ in range(30):
            n = int(rng.integers(1, 40))
            W = int(rng.integers(1, 12))
            ncols = int(rng.integers(1, 30))
            cols = rng.integers(0, ncols, (n, W)).astype(np.int32)
            vals = rng.standard_normal((n, W))
            valid = rng.random((n, W)) < 0.7
            c1, v1, r1 = dedup_rows_host(cols, vals, valid, ncols)
            c2, v2, r2 = dedup_rows(jnp.asarray(cols), jnp.asarray(vals),
                                    jnp.asarray(valid), ncols)
            np.testing.assert_array_equal(c1, np.asarray(c2))
            np.testing.assert_array_equal(r1, np.asarray(r2))
            np.testing.assert_allclose(v1, np.asarray(v2), atol=1e-12)

    def test_dedup_rows_device_complex(self):
        import numpy as np
        import jax.numpy as jnp
        from pyamg_tpu.ops.rowops import dedup_rows, dedup_rows_host
        rng = np.random.default_rng(3)
        cols = rng.integers(0, 9, (12, 6)).astype(np.int32)
        vals = rng.standard_normal((12, 6)) + 1j * rng.standard_normal((12, 6))
        valid = rng.random((12, 6)) < 0.8
        c1, v1, r1 = dedup_rows_host(cols, vals, valid, 9)
        c2, v2, r2 = dedup_rows(jnp.asarray(cols), jnp.asarray(vals),
                                jnp.asarray(valid), 9)
        np.testing.assert_array_equal(c1, np.asarray(c2))
        np.testing.assert_allclose(v1, np.asarray(v2), atol=1e-12)

    def test_spgemm_traced_matches_scipy(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from pyamg_tpu.gallery import poisson
        from pyamg_tpu.sparse.matrix import ELL, to_scipy
        from pyamg_tpu.ops.spgemm import _expand
        from pyamg_tpu.ops.rowops import dedup_rows
        A = poisson((9, 9)).astype(jnp.float64)
        S = to_scipy(A).tocsr()

        @jax.jit
        def ap(ac, av, arn, bc, bv, brn):
            Aj = ELL(ac, av, arn, A.shape)
            Bj = ELL(bc, bv, brn, A.shape)
            cc, vv, ok = _expand(Aj, Bj)
            return dedup_rows(cc, vv, ok, A.shape[1])

        c, v, rn = ap(jnp.asarray(A.cols), jnp.asarray(A.vals),
                      jnp.asarray(A.row_nnz), jnp.asarray(A.cols),
                      jnp.asarray(A.vals), jnp.asarray(A.row_nnz))
        C = (S @ S).tocsr(); C.sort_indices()
        rn = np.asarray(rn)
        np.testing.assert_array_equal(rn, np.diff(C.indptr))
        k = np.arange(c.shape[1])[None, :] < rn[:, None]
        np.testing.assert_array_equal(np.asarray(c)[k], C.indices)
        np.testing.assert_allclose(np.asarray(v)[k], C.data, rtol=1e-12)
