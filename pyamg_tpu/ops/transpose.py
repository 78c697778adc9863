"""Sparse transpose via global COO sort (setup-phase, pure host numpy).

Reference behavior: ``R = P.T.tocsr()`` (``classical/classical.py:189``,
``aggregation/aggregation.py:393-413``).  Flatten valid entries to COO,
swap (row, col), lexsort, rebuild the padded layout.  Runs once per level
at setup; the solve phase uses the pre-built transpose.  Deliberately
numpy-only: an eager jnp op here would lift the host arrays onto the
default device (a transfer + compile per op — catastrophic over a remote
TPU tunnel).  The device-resident transpose used by traced/distributed
setup lives in ``parallel/dist_setup._transpose_shard``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyamg_tpu.sparse.matrix import ELL, BELL, ell_from_csr_arrays


def transpose(A: ELL, conjugate: bool = False, width=None) -> ELL:
    n, m = A.shape
    W = A.width
    # pure-numpy path: setup-phase host arrays must never touch jnp here —
    # each eager op would lift them onto the default (possibly remote TPU)
    # device, costing a transfer + compile per op
    cols_np = np.asarray(A.cols)
    vals_np = np.asarray(A.vals)
    rows = np.broadcast_to(np.arange(n, dtype=np.int32)[:, None], (n, W))
    valid = np.arange(W)[None, :] < np.asarray(A.row_nnz)[:, None]
    vals_np = np.conj(vals_np) if conjugate else vals_np
    # new row = old col; invalid entries get row sentinel m (dropped below)
    # host sort+compaction (concrete at setup; int64-safe regardless of x64)
    t_rows = np.where(valid, cols_np, m).reshape(-1)
    t_cols = rows.reshape(-1).copy()
    t_vals = vals_np.reshape(-1)
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
    cols_np = np.asarray(A.cols)
    vals_np = np.asarray(A.vals)
    rows = np.broadcast_to(np.arange(nb, dtype=np.int32)[:, None], (nb, W))
    valid = np.arange(W)[None, :] < np.asarray(A.row_nnz)[:, None]
    vals_np = np.conj(vals_np) if conjugate else vals_np
    t_rows = np.where(valid, cols_np, mb).reshape(-1)
    t_cols = rows.reshape(-1).copy()
    t_vals = np.swapaxes(vals_np, -1, -2).reshape(-1, bc, br)
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
