"""Elementwise sparse algebra: add, scale, diagonal shifts, filters.

These replace scipy-operator arithmetic the reference uses at setup
(e.g. ``P = (I - omega*Dinv*A) @ T``, ``smooth.py:61``;
row/column scaling, ``util/utils.py:145-294``).

Setup-phase calls run in numpy (``is_concrete`` dispatch) — zero XLA
compiles; the same code traces with jnp inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyamg_tpu.sparse.matrix import ELL, BELL, is_concrete
from pyamg_tpu.ops.rowops import ell_dedup


def _xp(*arrays):
    return np if is_concrete(*arrays) else jnp


def scale(A, alpha):
    """alpha * A (works for ELL and BELL)."""
    if isinstance(A, BELL):
        return BELL(A.cols, A.vals * alpha, A.row_nnz, A.shape, A.blocksize)
    return ELL(A.cols, A.vals * alpha, A.row_nnz, A.shape)


def scale_rows(A: ELL, d: jax.Array) -> ELL:
    """diag(d) @ A."""
    return ELL(A.cols, A.vals * d[:, None], A.row_nnz, A.shape)


def scale_cols(A: ELL, d: jax.Array) -> ELL:
    """A @ diag(d)."""
    d = np.asarray(d) if is_concrete(d, A.vals) else d
    return ELL(A.cols, A.vals * d[A.cols], A.row_nnz, A.shape)


def add(A: ELL, B: ELL, width=None) -> ELL:
    """A + B for conforming ELL matrices (setup-phase; width compaction)."""
    assert A.shape == B.shape
    xp = _xp(A.vals, B.vals)
    cols = xp.concatenate([A.cols, B.cols], axis=1)
    vals = xp.concatenate([A.vals, B.vals], axis=1)
    valid = xp.concatenate([A.valid_mask(), B.valid_mask()], axis=1)
    return ell_dedup(cols, vals, valid, A.shape, width=width)


def sub(A: ELL, B: ELL, width=None) -> ELL:
    return add(A, scale(B, -1), width=width)


def add_scaled_identity(A: ELL, alpha=1.0, beta=1.0, width=None) -> ELL:
    """beta*I + alpha*A (square A)."""
    n = A.shape[0]
    xp = _xp(A.vals)
    rows = xp.arange(n, dtype=xp.int32)
    isdiag = (A.cols == rows[:, None]) & A.valid_mask()
    if xp is np and bool(isdiag.any(axis=1).all()):
        # every row stores its diagonal (the usual case): update in
        # place — no concatenate/sort/dedup restructuring
        vals = A.vals * alpha + xp.where(isdiag, beta, 0)
        return ELL(A.cols, vals, A.row_nnz, A.shape, grid=A.grid,
                   col_grid=A.col_grid)
    eye_col = rows[:, None]
    cols = xp.concatenate([A.cols, eye_col], axis=1)
    vals = xp.concatenate(
        [A.vals * alpha,
         xp.full((n, 1), beta, dtype=A.vals.dtype)], axis=1)
    valid = xp.concatenate(
        [A.valid_mask(), xp.ones((n, 1), bool)], axis=1)
    return ell_dedup(cols, vals, valid, A.shape, width=width)


def with_diagonal(A: ELL, d: jax.Array) -> ELL:
    """Replace (or insert) the diagonal of A with vector d."""
    n = A.shape[0]
    xp = _xp(A.vals, d)
    rows = xp.arange(n, dtype=xp.int32)
    isdiag = (A.cols == rows[:, None]) & A.valid_mask()
    if xp is np and bool(isdiag.any(axis=1).all()):
        vals = xp.where(isdiag, xp.asarray(d)[:, None], A.vals)
        return ELL(A.cols, vals, A.row_nnz, A.shape, grid=A.grid,
                   col_grid=A.col_grid)
    vals = xp.where(isdiag, 0, A.vals)
    eye_col = rows[:, None]
    cols = xp.concatenate([A.cols, eye_col], axis=1)
    vals = xp.concatenate([vals, d[:, None]], axis=1)
    valid = xp.concatenate([A.valid_mask(), xp.ones((n, 1), bool)], axis=1)
    return ell_dedup(cols, vals, valid, A.shape)


def remove_diagonal(A: ELL) -> ELL:
    """A with its diagonal entries dropped (reference ``util/utils.py:1699``)."""
    n = A.shape[0]
    xp = _xp(A.vals)
    rows = xp.arange(n, dtype=xp.int32)
    keep = (A.cols != rows[:, None]) & A.valid_mask()
    return ell_dedup(A.cols, A.vals, keep, A.shape)


def filter_rows_by_mask(A: ELL, keep: jax.Array) -> ELL:
    """Drop stored entries where ``keep`` (n, W) is False (recompacts)."""
    return ell_dedup(A.cols, A.vals, keep & A.valid_mask(), A.shape)
