"""Double-single (two-float) arithmetic for f64-accuracy residuals on TPU.

TPU has no f64 ALU.  The reference reaches 1e-10 relative residuals in
native f64 (``pyamg/multilevel.py:544-582`` runs entirely in the input
dtype); the TPU-native equivalent is mixed-precision iterative refinement
where the *outer* residual ``r = b - A x`` must carry ~48 mantissa bits
while all heavy inner compute stays f32.  Double-single ("double-word")
arithmetic represents a value as an unevaluated sum ``hi + lo`` of two
f32 and reaches ~2^-48 relative accuracy using only exact IEEE f32
error-free transforms (Dekker's split/two-product, Knuth's two-sum) —
pure VPU elementwise ops, no emulated f64 anywhere.

Used by ``MultilevelSolver.solve_refined`` (device path) so the entire
defect-correction loop runs in ONE jitted program with zero host
round-trips.

All functions are shape-polymorphic elementwise ops on (hi, lo) pairs.
"""

from __future__ import annotations

import jax.numpy as jnp

_SPLIT = 4097.0     # 2^12 + 1 (f32 has 24 mantissa bits; 24 - 24//2 = 12)


def two_sum(a, b):
    """Exact sum: a + b = s + e with s = fl(a+b).  Knuth's 6-op form
    (no magnitude ordering required)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Exact sum assuming |a| >= |b| (3 ops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a = hi + lo with hi, lo having <=12 mantissa bits."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact product: a * b = p + e with p = fl(a*b) (Dekker, FMA-free)."""
    p = a * b
    ahi, alo = split(a)
    bhi, blo = split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def ds_add(xhi, xlo, yhi, ylo):
    """(x) + (y) in double-single, normalized."""
    s, e = two_sum(xhi, yhi)
    e = e + (xlo + ylo)
    return quick_two_sum(s, e)


def ds_add_f32(xhi, xlo, y):
    """(x) + y for plain-f32 y."""
    s, e = two_sum(xhi, y)
    e = e + xlo
    return quick_two_sum(s, e)


def ds_neg(xhi, xlo):
    return -xhi, -xlo


def ds_mul_f32(xhi, xlo, c):
    """(x) * c for plain-f32 c (c's own rounding error is the caller's
    concern; exact within DS otherwise)."""
    p, e = two_prod(xhi, c)
    e = e + xlo * c
    return quick_two_sum(p, e)


def ds_from_f64(x64):
    """Host-side: split a f64 array into a (hi, lo) f32 pair."""
    import numpy as np
    hi = np.asarray(x64, np.float64).astype(np.float32)
    lo = (np.asarray(x64, np.float64) - hi.astype(np.float64)) \
        .astype(np.float32)
    return hi, lo


def ds_to_f64(hi, lo):
    """Host-side: recombine to f64."""
    import numpy as np
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def ds_dot_f32(ahi, alo, bhi, blo):
    """Approximate DS dot product: f32 pairwise accumulation of the
    dominant cross terms.  Accurate to ~eps32 *relative* — enough for
    norms/thresholds (values, not differences, are what need DS here)."""
    return jnp.sum(ahi * bhi + (ahi * blo + alo * bhi))


def ds_matvec_dia(data_hi, data_lo, offsets, n, xhi, xlo):
    """Banded (DIA) matvec in double-single: y = A @ x.

    ``data_{hi,lo}``: (ndiag, npad) f32 pair of the f64 diagonals;
    ``offsets``: static tuple.  Each nnz contributes an exact two_prod of
    the dominant term plus the first-order cross terms; accumulation is
    DS two_sum.  ~25 VPU flops/nnz — still memory-bound, and only run
    once per outer refinement step.
    """
    from jax import lax
    lo_off = max(0, -min(offsets))
    hi_off = max(0, max(offsets))
    pad = (lo_off, hi_off)
    xhip = jnp.pad(xhi, pad)
    xlop = jnp.pad(xlo, pad)
    yhi = jnp.zeros((n,), jnp.float32)
    ylo = jnp.zeros((n,), jnp.float32)
    for d, off in enumerate(offsets):
        xs_hi = lax.slice_in_dim(xhip, lo_off + off, lo_off + off + n)
        xs_lo = lax.slice_in_dim(xlop, lo_off + off, lo_off + off + n)
        a_hi = data_hi[d][:n]
        a_lo = data_lo[d][:n]
        p, e = two_prod(a_hi, xs_hi)
        e = e + (a_hi * xs_lo + a_lo * xs_hi)
        thi, tlo = quick_two_sum(p, e)
        yhi, ylo = ds_add(yhi, ylo, thi, tlo)
    return yhi, ylo


def ds_matvec_ell(cols, vals_hi, vals_lo, xhi, xlo):
    """ELL matvec in double-single (gather-based general path).

    ``vals_{hi,lo}``: (n, W) f32 pair; padding slots must be zero in both.
    """
    xg_hi = xhi[cols]                     # (n, W)
    xg_lo = xlo[cols]
    yhi = jnp.zeros((cols.shape[0],), jnp.float32)
    ylo = jnp.zeros((cols.shape[0],), jnp.float32)
    for k in range(cols.shape[1]):
        p, e = two_prod(vals_hi[:, k], xg_hi[:, k])
        e = e + (vals_hi[:, k] * xg_lo[:, k] + vals_lo[:, k] * xg_hi[:, k])
        thi, tlo = quick_two_sum(p, e)
        yhi, ylo = ds_add(yhi, ylo, thi, tlo)
    return yhi, ylo


def ds_residual(A_ds, xhi, xlo, bhi, blo):
    """r = b - A x in double-single.  ``A_ds`` is the pytree produced by
    ``ds_operator`` (kind, arrays...)."""
    kind = A_ds["kind"]
    if kind == "dia":
        yhi, ylo = ds_matvec_dia(A_ds["data_hi"], A_ds["data_lo"],
                                 A_ds["offsets"], A_ds["n"], xhi, xlo)
    elif kind == "ell":
        yhi, ylo = ds_matvec_ell(A_ds["cols"], A_ds["vals_hi"],
                                 A_ds["vals_lo"], xhi, xlo)
    else:
        raise ValueError(kind)
    return ds_add(bhi, blo, -yhi, -ylo)


def ds_operator(A64, kind=None):
    """Host-side: build the DS form of a f64 fine operator.

    Accepts a host DIA or ELL container (f64 values), or anything
    ``sparse.matrix.from_scipy`` can produce.  Returns a dict pytree with
    static 'kind'/'offsets'/'n' entries and f32 array pairs.  ``kind``
    forces the layout ('dia'/'ell'); default prefers the gather-free DIA
    form when the operator is banded.
    """
    import numpy as np
    from pyamg_tpu.sparse.matrix import ELL, DIA, dia_from_ell
    if isinstance(A64, ELL) and kind != "ell":
        D = dia_from_ell(A64)
        if D is not None:
            A64 = D
    if isinstance(A64, DIA):
        data = np.asarray(A64.data, np.float64)
        hi, lo = ds_from_f64(data)
        return {"kind": "dia", "data_hi": jnp.asarray(hi),
                "data_lo": jnp.asarray(lo),
                "offsets": tuple(int(o) for o in A64.offsets),
                "n": A64.shape[0]}
    if isinstance(A64, ELL):
        vals = np.asarray(A64.vals, np.float64)
        hi, lo = ds_from_f64(vals)
        return {"kind": "ell", "cols": jnp.asarray(A64.cols),
                "vals_hi": jnp.asarray(hi), "vals_lo": jnp.asarray(lo)}
    raise TypeError(f"unsupported operator type {type(A64).__name__}")
