"""SELL (shift-ELL) plan/kernel gold tests.

The plan builder and both SpMV kernels (VMEM-resident and the tiled
windowed-DMA variant for large squares) are checked against scipy on the
CPU backend (Pallas interpret mode), mirroring the reference's
kernel-vs-gold discipline (SURVEY.md §4.1).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse.matrix import from_scipy, to_scipy
from pyamg_tpu.sparse.sell import sell_from_ell, sell_to_scipy
from pyamg_tpu.ops.sell_kernels import (sell_spmv, sell_gs_sweep,
                                        _pick_tile_rows, _VMEM_X_BUDGET)


def _rand_band(n, rng, extra=30):
    """Square banded-ish matrix with some scattered couplings."""
    A = to_scipy(poisson((int(np.sqrt(n)), int(np.sqrt(n))))).tolil()
    n = A.shape[0]
    idx = rng.integers(0, n, size=2 * extra)
    for i, j in zip(idx[::2], idx[1::2]):
        A[int(i), int(j)] = rng.standard_normal()
    return sp.csr_matrix(A.astype(np.float32))


def test_sell_plan_roundtrip():
    rng = np.random.default_rng(0)
    S = _rand_band(30 * 30, rng)
    P = sell_from_ell(from_scipy(S))
    assert P is not None
    back = sell_to_scipy(P)
    assert abs(back - S).max() < 1e-12
    np.testing.assert_allclose(np.asarray(P.diagonal()),
                               S.diagonal(), atol=1e-12)


def test_sell_spmv_interpret_matches_scipy():
    rng = np.random.default_rng(1)
    S = _rand_band(28 * 28, rng)
    P = sell_from_ell(from_scipy(S))
    x = rng.standard_normal(S.shape[1]).astype(np.float32)
    y = np.asarray(sell_spmv(P, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, S @ x, rtol=1e-5, atol=1e-5)


def test_sell_rectangular_spmv():
    """Tall transfer-like operator (fine x coarse)."""
    rng = np.random.default_rng(2)
    n, m = 1024, 256
    rows = np.repeat(np.arange(n), 2)
    cols = np.concatenate([np.clip(np.arange(n) // 4, 0, m - 1),
                           np.clip(np.arange(n) // 4 + 1, 0, m - 1)])
    vals = rng.standard_normal(2 * n).astype(np.float32)
    S = sp.csr_matrix((vals, (rows, cols)), shape=(n, m))
    P = sell_from_ell(from_scipy(S))
    assert P is not None and P.kind == "tall" and P.t == 4
    x = rng.standard_normal(m).astype(np.float32)
    y = np.asarray(sell_spmv(P, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, S @ x, rtol=1e-5, atol=1e-5)


def test_sell_tiled_kernel_matches_scipy():
    """Force the windowed-DMA tiled path (big-square kernel) on a
    moderate problem by shrinking the VMEM budget."""
    import pyamg_tpu.ops.sell_kernels as sk
    rng = np.random.default_rng(3)
    S = to_scipy(poisson((80, 80))).astype(np.float32).tocsr()
    P = sell_from_ell(from_scipy(S))
    assert P is not None and P.t == 1 and P.kind == "tall"
    x = rng.standard_normal(S.shape[1]).astype(np.float32)
    y_plain = np.asarray(sell_spmv(P, jnp.asarray(x), interpret=True))
    old = sk._VMEM_X_BUDGET
    try:
        sk._VMEM_X_BUDGET = 1024           # force the tiled dispatch
        y_tiled = np.asarray(sell_spmv(P, jnp.asarray(x), interpret=True))
    finally:
        sk._VMEM_X_BUDGET = old
    np.testing.assert_allclose(y_tiled, S @ x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_tiled, y_plain, rtol=1e-6, atol=1e-6)


def test_sell_big_square_accepted():
    """The builder accepts squares past the old 2.5M cap (VERDICT r3
    weak #6); plan metadata stays consistent."""
    n = 1800 ** 2                       # 3.24M > 2.5M
    S = to_scipy(poisson((1800, 1800))).astype(np.float32).tocsr()
    P = sell_from_ell(from_scipy(S))
    assert P is not None
    assert P.shape == (n, n)
    assert P.Sy % 512 == 0
    span = P.base_hi - P.base_lo + P.K - 1
    assert _pick_tile_rows(P.n_passes, P.K, span, P.Sy) is not None
    # spot-check a few rows against scipy
    back = sell_to_scipy(P)
    rows = [0, 1799, n // 2, n - 1]
    for r in rows:
        np.testing.assert_allclose(back[r].toarray(), S[r].toarray(),
                                   atol=1e-12)


def test_sell_gs_sweep_reduces_error():
    rng = np.random.default_rng(4)
    S = to_scipy(poisson((24, 24))).astype(np.float32).tocsr()
    P = sell_from_ell(from_scipy(S))
    n = S.shape[0]
    b = rng.standard_normal(n).astype(np.float32)
    Dinv = (1.0 / S.diagonal()).astype(np.float32)
    x = jnp.zeros(n, jnp.float32)
    r0 = np.linalg.norm(b)
    for _ in range(5):
        x = sell_gs_sweep(P, x, jnp.asarray(b), jnp.asarray(Dinv),
                          sweep="symmetric", interpret=True)
    r = np.linalg.norm(b - S @ np.asarray(x))
    assert r < 0.25 * r0
