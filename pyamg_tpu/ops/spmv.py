"""Sparse matrix-vector products (the solve-phase hot kernel).

Reference behavior: scipy CSR/BSR matvec drives every smoother sweep,
residual, restriction and prolongation in the V-cycle
(``/root/reference/pyamg/multilevel.py:584-662``).

TPU design: ELL layout makes SpMV a dense gather + multiply + row-reduce:

    y[i] = sum_k vals[i, k] * x[cols[i, k]]

which XLA lowers to fused gather/fma — no scalar loops, static shapes.
Padding slots have ``vals == 0`` so no masking is needed.  Multiple
right-hand sides broadcast over a trailing axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from pyamg_tpu.sparse.matrix import ELL, BELL, DIA, PhaseStencil, is_concrete


def _xp(*arrays):
    return np if is_concrete(*arrays) else jnp


def _scipy_memo(A):
    """Cached scipy view of a host-backed container (setup phase)."""
    S = getattr(A, "_scipy_view", None)
    if S is None:
        from pyamg_tpu.sparse.matrix import to_scipy
        S = to_scipy(A)
        object.__setattr__(A, "_scipy_view", S)
    return S


def spmv(A: ELL, x: jax.Array) -> jax.Array:
    """y = A @ x for ELL A; x of shape (n_cols,) or (n_cols, k)."""
    if is_concrete(A.vals, x):               # host/setup path (no compiles)
        return _scipy_memo(A) @ np.asarray(x)
    if x.ndim == 1:
        xg = x[A.cols]                      # (n, W)
        return jnp.sum(A.vals * xg, axis=1)
    xg = x[A.cols]                          # (n, W, k)
    return jnp.sum(A.vals[..., None] * xg, axis=1)


def rspmv(A: ELL, x: jax.Array) -> jax.Array:
    """y = A.T @ x without materializing the transpose (scatter-add form).

    Used where the reference does ``P.T @ r``; prefer a pre-built transpose
    (static plan) in the cycle — this exists for one-off setup computations.
    """
    if is_concrete(A.vals, x):               # host/setup path
        return _scipy_memo(A).T @ np.asarray(x)
    n_cols = A.shape[1]
    contrib = A.vals * x[:, None]           # (n, W)
    return jnp.zeros((n_cols,), dtype=contrib.dtype).at[A.cols].add(contrib)


def bspmv(A: BELL, x: jax.Array) -> jax.Array:
    """y = A @ x for block-ELL A; x flat of shape (n_cols,) or (n_cols, k)."""
    if is_concrete(A.vals, x):               # host/setup path
        return _scipy_memo(A) @ np.asarray(x)
    br, bc = A.blocksize
    nb = A.n_block_rows
    nbc = A.n_block_cols
    if x.ndim == 1:
        xb = x.reshape(nbc, bc)
        xg = xb[A.cols]                     # (nb, W, bc)
        # (nb, W, br, bc) @ (nb, W, bc) -> (nb, W, br) -> sum W
        y = jnp.einsum("nwij,nwj->ni", A.vals, xg)
        return y.reshape(nb * br)
    k = x.shape[1]
    xb = x.reshape(nbc, bc, k)
    xg = xb[A.cols]                         # (nb, W, bc, k)
    y = jnp.einsum("nwij,nwjk->nik", A.vals, xg)
    return y.reshape(nb * br, k)


def dia_spmv(A: DIA, x: jax.Array) -> jax.Array:
    """y = A @ x for banded A: a sum of shifted elementwise products.

    Gather-free — each diagonal contributes ``data[d] * x[i + off]`` via a
    static slice of a zero-padded x.  XLA fuses the whole sum into one
    streaming pass, which is the TPU speed-of-light formulation for
    stencil operators (vs. the gather-based ELL path).
    """
    from pyamg_tpu.ops.pallas_kernels import dia_spmv_pallas, \
        pallas_available
    if x.ndim == 1 and not is_concrete(x) and pallas_available():
        y = dia_spmv_pallas(A, x)
        if y is not None:
            return y
    n = A.shape[0]
    offs = A.offsets
    lo = max(0, -min(offs))
    hi = max(0, max(offs))
    pad = [(lo, hi)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad)
    acc = None
    for d, off in enumerate(offs):
        xs = jax.lax.slice_in_dim(xp, lo + off, lo + off + n, axis=0)
        term = A.data[d][:n][(...,) + (None,) * (x.ndim - 1)] * xs
        acc = term if acc is None else acc + term
    return acc


def matvec(A, x):
    """Dispatch on container type."""
    if isinstance(A, BELL):
        return bspmv(A, x)
    if isinstance(A, DIA):
        return dia_spmv(A, x)
    if isinstance(A, PhaseStencil):
        return A.mv(x)
    if isinstance(A, ELL):
        return spmv(A, x)
    return A.mv(x)                 # SELL, HaloELL and other mv-providers


def extract_diagonal(A) -> jax.Array:
    """diag(A) as a dense vector (scalar matrices).

    Reference: ``pyamg/util/utils.py:541`` (``get_diagonal``).
    """
    if isinstance(A, DIA):
        return A.diagonal()
    from pyamg_tpu.sparse.sell import SELL
    if isinstance(A, SELL):
        return A.diagonal()
    if isinstance(A, BELL):
        br, bc = A.blocksize
        assert br == bc
        nb = A.n_block_rows
        xp = _xp(A.vals)
        rows = xp.arange(nb, dtype=xp.int32)
        hit = (A.cols == rows[:, None]) & A.valid_mask()
        dblk = xp.einsum("nw,nwij->nij", hit.astype(A.vals.dtype), A.vals)
        idx = xp.arange(br)
        return dblk[:, idx, idx].reshape(nb * br)
    n = A.shape[0]
    xp = _xp(A.vals)
    rows = xp.arange(n, dtype=xp.int32)
    hit = (A.cols == rows[:, None]) & A.valid_mask()
    return xp.sum(xp.where(hit, A.vals, 0), axis=1)


def extract_block_diagonal(A: BELL) -> jax.Array:
    """(nb, br, bc) array of diagonal blocks."""
    nb = A.n_block_rows
    xp = _xp(A.vals)
    rows = xp.arange(nb, dtype=xp.int32)
    hit = (A.cols == rows[:, None]) & A.valid_mask()
    return xp.einsum("nw,nwij->nij", hit.astype(A.vals.dtype), A.vals)


def row_max_abs_offdiag(A: ELL) -> jax.Array:
    """max_k |A[i, k]| over stored off-diagonal entries of each row.

    Building block for classical strength of connection
    (reference ``ruge_stuben.h:230`` ``maximum_row_value``).
    """
    n = A.shape[0]
    xp = _xp(A.vals)
    rows = xp.arange(n, dtype=xp.int32)
    offd = (A.cols != rows[:, None]) & A.valid_mask()
    return xp.max(xp.where(offd, xp.abs(A.vals), 0), axis=1)
