"""Double-single (two-float) arithmetic gold tests vs f64.

The TPU device path of ``MultilevelSolver.solve_refined`` computes outer
defect-correction residuals in DS arithmetic (``ops/ds.py``); these tests
pin its accuracy (~2^-48 relative) against numpy f64 on the CPU backend,
the same gold-twin discipline the reference uses for its C++ kernels
(e.g. ``/root/reference/pyamg/tests/test_relaxation.py:251-296``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyamg_tpu.ops import ds
from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse.matrix import to_scipy, from_scipy, dia_from_ell


def _f32(x):
    return jnp.asarray(np.asarray(x, np.float32))


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000).astype(np.float32)
    b = (rng.standard_normal(1000) * 1e-6).astype(np.float32)
    s, e = ds.two_sum(_f32(a), _f32(b))
    exact = a.astype(np.float64) + b.astype(np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, np.asarray(np.float32(s), np.float64)
                          + np.asarray(e, np.float64))
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(1000).astype(np.float32)
    p, e = ds.two_prod(_f32(a), _f32(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_ds_roundtrip_f64():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(1000) * np.exp(rng.standard_normal(1000) * 5)
    hi, lo = ds.ds_from_f64(x)
    back = ds.ds_to_f64(hi, lo)
    # hi+lo reproduces f64 to ~2^-48 relative
    assert np.max(np.abs(back - x) / np.abs(x)) < 2.0 ** -47


def test_ds_add_accuracy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(500)
    y = rng.standard_normal(500) * 1e-8
    xhi, xlo = map(_f32, ds.ds_from_f64(x))
    yhi, ylo = map(_f32, ds.ds_from_f64(y))
    shi, slo = ds.ds_add(xhi, xlo, yhi, ylo)
    got = ds.ds_to_f64(np.asarray(shi), np.asarray(slo))
    err = np.abs(got - (x + y))
    assert np.max(err / np.abs(x + y)) < 2.0 ** -45


@pytest.mark.parametrize("kind", ["dia", "ell"])
def test_ds_residual_matches_f64(kind):
    """r = b - A x in DS matches the f64 residual to ~1e-13 relative even
    when the residual is 1e-9 of b (deep cancellation)."""
    A64 = poisson((40, 40))
    As = to_scipy(A64)
    n = As.shape[0]
    rng = np.random.default_rng(4)
    xstar = rng.standard_normal(n)
    b = As @ xstar
    # x agrees with xstar to ~1e-9: residual is pure cancellation
    x = xstar * (1.0 + 1e-9 * rng.standard_normal(n))
    r64 = b - As @ x

    if kind == "dia":
        A_ds = ds.ds_operator(dia_from_ell(A64))
    else:
        ell = from_scipy(As)
        A_ds = ds.ds_operator(
            type(ell)(ell.cols, np.asarray(ell.vals, np.float64),
                      ell.row_nnz, ell.shape), kind="ell")
        assert A_ds["kind"] == "ell"
    A_ds = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
            for k, v in A_ds.items()}
    xhi, xlo = map(_f32, ds.ds_from_f64(x))
    bhi, blo = map(_f32, ds.ds_from_f64(b))
    rhi, rlo = ds.ds_residual(A_ds, xhi, xlo, bhi, blo)
    got = ds.ds_to_f64(np.asarray(rhi), np.asarray(rlo))
    scale = np.linalg.norm(b)
    # f32 residual would be ~1e-7*scale wrong; DS must be ~1e-13*scale
    assert np.linalg.norm(got - r64) < 1e-12 * scale
    # and the norm itself is accurate
    assert abs(np.linalg.norm(got) - np.linalg.norm(r64)) \
        < 1e-6 * np.linalg.norm(r64)


def test_ds_mul_f32():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(500)
    c = np.float32(1.2345678)
    xhi, xlo = map(_f32, ds.ds_from_f64(x))
    phi, plo = ds.ds_mul_f32(xhi, xlo, c)
    got = ds.ds_to_f64(np.asarray(phi), np.asarray(plo))
    exact = x * np.float64(c)
    assert np.max(np.abs(got - exact) / np.abs(exact)) < 2.0 ** -45
