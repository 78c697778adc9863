"""Sparse transpose via global COO sort (setup-phase).

Reference behavior: ``R = P.T.tocsr()`` (``classical/classical.py:189``,
``aggregation/aggregation.py:393-413``).  On TPU: flatten valid entries to
COO, swap (row, col), sort by the new (row, col) key with XLA's vectorized
sort, and rebuild the padded layout.  Runs once per level at setup; the
solve phase uses the pre-built transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyamg_tpu.sparse.matrix import ELL, BELL, ell_from_csr_arrays


def transpose(A: ELL, conjugate: bool = False, width=None) -> ELL:
    n, m = A.shape
    W = A.width
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, W))
    valid = A.valid_mask()
    vals = jnp.conj(A.vals) if conjugate else A.vals
    # new row = old col; invalid entries get row sentinel m (dropped below)
    # host sort+compaction (concrete at setup; int64-safe regardless of x64)
    t_rows = np.asarray(jnp.where(valid, A.cols, m).reshape(-1))
    t_cols = np.asarray(rows.reshape(-1))
    t_vals = np.asarray(vals.reshape(-1))
    keep = t_rows < m
    t_rows, t_cols, t_vals = t_rows[keep], t_cols[keep], t_vals[keep]
    order = np.lexsort((t_cols, t_rows))
    t_rows, t_cols, t_vals = t_rows[order], t_cols[order], t_vals[order]
    counts = np.bincount(t_rows, minlength=m).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return ell_from_csr_arrays(indptr, t_cols, t_vals, (m, n), width=width)


def btranspose(A: BELL, conjugate: bool = False, width=None) -> BELL:
    """Transpose a block matrix (blocks are transposed too)."""
    nb, mb = A.n_block_rows, A.n_block_cols
    W = A.width
    br, bc = A.blocksize
    rows = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[:, None], (nb, W))
    valid = A.valid_mask()
    vals = jnp.conj(A.vals) if conjugate else A.vals
    t_rows = np.asarray(jnp.where(valid, A.cols, mb).reshape(-1))
    t_cols = np.asarray(rows.reshape(-1))
    t_vals = np.asarray(jnp.swapaxes(vals, -1, -2).reshape(-1, bc, br))
    keep = t_rows < mb
    t_rows, t_cols, t_vals = t_rows[keep], t_cols[keep], t_vals[keep]
    order = np.lexsort((t_cols, t_rows))
    t_rows, t_cols, t_vals = t_rows[order], t_cols[order], t_vals[order]
    counts = np.bincount(t_rows, minlength=mb).astype(np.int64)
    if width is None:
        width = max(int(counts.max()) if mb else 0, 1)
    cols = np.zeros((mb, width), np.int32)
    blks = np.zeros((mb, width, bc, br), t_vals.dtype)
    if len(t_rows):
        indptr = np.concatenate([[0], np.cumsum(counts)])
        offs = np.arange(len(t_rows)) - np.repeat(indptr[:-1], counts)
        cols[t_rows, offs] = t_cols
        blks[t_rows, offs] = t_vals
    return BELL(jnp.asarray(cols), jnp.asarray(blks),
                jnp.asarray(counts.astype(np.int32)),
                (A.shape[1], A.shape[0]), (bc, br))
