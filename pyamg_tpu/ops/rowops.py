"""Shared row-wise primitives for ELL algebra.

The central trick: any op producing candidate (col, val) pairs per row
(SpGEMM expansion, sparse add, filtering) is normalized by
``dedup_rows``: per-row sort by column, coalesce duplicate columns by
segment-add, and left-compact valid entries.  Everything is static-shape and
vectorized over rows — the TPU-native replacement for the reference's
sequential CSR builder loops (e.g. ``ruge_stuben.h:777-930``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pyamg_tpu.sparse.matrix import ELL, is_concrete


def dedup_rows_host(cols, vals, valid, n_cols: int):
    """Numpy twin of ``dedup_rows`` — setup phase runs on host where each
    eager XLA dispatch would pay a fresh ~1s tiny-kernel compile (the
    dominant setup cost on small-CPU hosts)."""
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    valid = np.asarray(valid)
    n, W = cols.shape
    # int32 keys: columns fit, and this host's int64 vector ops are
    # ~60x slower than int32
    sent = np.int32(min(n_cols, 2 ** 31 - 1))
    c = np.where(valid, cols.astype(np.int32, copy=False), sent)
    v = np.where(valid, vals, 0)
    # already-sorted fast path: when every real entry is STRICTLY
    # greater than its left neighbour (so no duplicates to accumulate
    # and the sentinel tail is a suffix), the input is its own answer —
    # the common case: patterns derived from an already-sorted ELL
    if W > 1 and not ((c[:, 1:] <= c[:, :-1]) &
                      (c[:, 1:] < sent)).any():
        live = c < sent
        row_nnz = live.sum(axis=1, dtype=np.int32)
        return (np.where(live, c, 0).astype(np.int32, copy=False),
                np.where(live, v, 0), row_nnz)
    order = np.argsort(c, axis=1, kind="stable")
    if n * W < 2 ** 31:
        # flat int32 gathers: take_along_axis routes through int64
        # fancy indexing (~7x slower on this host)
        flat = np.arange(n, dtype=np.int32)[:, None] * np.int32(W) + \
            order.astype(np.int32)
        c = c.ravel()[flat]
        v = v.reshape(-1)[flat]
    else:
        c = np.take_along_axis(c, order, axis=1)
        v = np.take_along_axis(v, order, axis=1)
    head = np.concatenate(
        [np.ones((n, 1), bool), c[:, 1:] != c[:, :-1]], axis=1)
    head = head & (c < sent)
    row_nnz = head.sum(axis=1, dtype=np.int32)
    if W == 1 or not ((c[:, 1:] == c[:, :-1]) &
                      (c[:, 1:] < sent)).any():
        # no duplicates (the common safety-dedup case): the sorted
        # arrays ARE the answer — skip the scatter-accumulate entirely
        keepc = np.where(head, c, 0).astype(np.int32, copy=False)
        return keepc, np.where(head, v, 0), row_nnz
    pos = np.maximum(np.cumsum(head, axis=1) - 1, 0)
    rows = np.arange(n)[:, None]
    out_vals = np.zeros_like(v)
    np.add.at(out_vals, (np.broadcast_to(rows, (n, W)), pos), v)
    out_cols = np.zeros((n, W), np.int32)
    np.maximum.at(out_cols, (np.broadcast_to(rows, (n, W)), pos),
                  np.where(head, c, 0).astype(np.int32, copy=False))
    k = np.arange(W)[None, :]
    tail = k >= row_nnz[:, None]
    out_vals[tail] = 0
    out_cols[tail] = 0
    return out_cols, out_vals, row_nnz


def dedup_rows(cols: jax.Array, vals: jax.Array, valid: jax.Array,
               n_cols: int):
    """Coalesce per-row candidate entries (device path, scatter-free).

    TPU scatters serialize (~90 ms for a (262k, 32) scatter-add vs ~2 ms
    for a lane sort on v5e), so the coalesce+compact is built from two
    lane sorts and a cumsum instead:

      1. sort (col, val) by column; padding carries the ``n_cols``
         sentinel so it sinks to the right, with zero values.
      2. running sum ``s = cumsum(val)`` along the row; each duplicate
         segment's sum is the difference of ``s`` at consecutive segment
         *end* slots (padding zeros never perturb ``s``).
      3. a stable sort by "not a segment end" left-compacts the end slots
         in column order; first-difference of the compacted ``s`` yields
         the coalesced values.

    Args:
      cols: (n, W) int32 candidate column indices.
      vals: (n, W) candidate values.
      valid: (n, W) bool; invalid entries are dropped.
      n_cols: column dimension (used as the sort sentinel).

    Returns:
      (out_cols, out_vals, row_nnz): entries sorted by column and
      left-compacted; slots >= row_nnz[i] are zero.  Static width W.
    """
    n, W = cols.shape
    sent = jnp.int32(n_cols)
    c = jnp.where(valid, cols.astype(jnp.int32), sent)
    v = jnp.where(valid, vals, 0)
    if W == 1:
        rn = (c[:, 0] < sent).astype(jnp.int32)
        return jnp.where(c < sent, c, 0), v, rn
    cplx = jnp.issubdtype(v.dtype, jnp.complexfloating)
    if cplx:
        c, vre, vim = jax.lax.sort((c, v.real, v.imag), dimension=1,
                                   num_keys=1)
        v = jax.lax.complex(vre, vim)
    else:
        c, v = jax.lax.sort((c, v), dimension=1, num_keys=1)
    neq = c[:, 1:] != c[:, :-1]
    head = jnp.concatenate([jnp.ones((n, 1), bool), neq], axis=1) \
        & (c < sent)
    row_nnz = jnp.sum(head, axis=1).astype(jnp.int32)
    s = jnp.cumsum(v, axis=1)
    # segment-end slots: last slot of each equal-column run (the padding
    # run contributes one end, masked off below by row_nnz)
    islast = jnp.concatenate([neq, jnp.ones((n, 1), bool)], axis=1)
    key = (~islast).astype(jnp.int32)
    if cplx:
        _, c2, s2re, s2im = jax.lax.sort((key, c, s.real, s.imag),
                                         dimension=1, num_keys=1,
                                         is_stable=True)
        s2 = jax.lax.complex(s2re, s2im)
    else:
        _, c2, s2 = jax.lax.sort((key, c, s), dimension=1, num_keys=1,
                                 is_stable=True)
    prev = jnp.concatenate([jnp.zeros((n, 1), s2.dtype), s2[:, :-1]],
                           axis=1)
    out_vals = s2 - prev
    k = jnp.arange(W, dtype=jnp.int32)[None, :]
    keep = k < row_nnz[:, None]
    out_cols = jnp.where(keep, c2, 0)
    out_vals = jnp.where(keep, out_vals, 0)
    return out_cols, out_vals, row_nnz


def compact_width(cols, vals, row_nnz, shape, width=None, min_width=1) -> ELL:
    """Shrink padded width to max(row_nnz) (host sync — setup phase only)."""
    if width is None:
        width = max(int(np.max(np.asarray(row_nnz))) if row_nnz.shape[0]
                    else 0, min_width)
    width = min(width, cols.shape[1]) if cols.shape[1] > 0 else min_width
    return ELL(cols[:, :width], vals[:, :width], row_nnz,
               (int(shape[0]), int(shape[1])))


def ell_dedup(cols, vals, valid, shape, width=None, min_width=1) -> ELL:
    if is_concrete(cols, vals, valid):
        c, v, rn = dedup_rows_host(cols, vals, valid, shape[1])
    else:
        c, v, rn = dedup_rows(cols, vals, valid, shape[1])
    return compact_width(c, v, rn, shape, width=width, min_width=min_width)


def row_lookup(A: ELL, qcols: jax.Array, qvalid=None) -> jax.Array:
    """Per-row membership lookup: out[i, k] = A[i, qcols[i, k]] (0 if absent).

    ``qcols`` may have any trailing width; A's rows are column-sorted with a
    zero-padding tail, which is re-sentineled so searchsorted stays valid.
    Jittable (static shapes); the sparse analogue of a gather.
    """
    if is_concrete(A.cols, A.vals, qcols) and \
            (qvalid is None or is_concrete(qvalid)):
        # host twin: one flat searchsorted with per-row offsets (the
        # setup phase must not dispatch per-shape device programs)
        n, W = A.cols.shape
        sent = np.int64(A.shape[1]) + 1
        k = np.arange(W, dtype=np.int64)[None, :]
        acols = np.where(k < np.asarray(A.row_nnz)[:, None],
                         np.asarray(A.cols, np.int64), sent)
        stride = sent + 1
        roff = stride * np.arange(n, dtype=np.int64)[:, None]
        flat = (acols + roff).ravel()          # globally sorted
        q = np.asarray(qcols, np.int64) + roff[:, :1]
        idx = np.searchsorted(flat, q.ravel()).reshape(q.shape)
        idx = np.clip(idx, 0, n * W - 1)
        hit = flat[idx] == q
        out = np.asarray(A.vals).reshape(-1)[idx]
        if qvalid is not None:
            hit = hit & np.asarray(qvalid)
        return np.where(hit, out, 0)
    n, W = A.cols.shape
    sent = jnp.int32(A.shape[1])
    k = jnp.arange(W, dtype=jnp.int32)[None, :]
    acols = jnp.where(k < A.row_nnz[:, None], A.cols, sent)
    idx = jax.vmap(jnp.searchsorted)(acols, qcols)
    idx = jnp.clip(idx, 0, W - 1)
    hit = jnp.take_along_axis(acols, idx, axis=1) == qcols
    out = jnp.take_along_axis(A.vals, idx, axis=1)
    if qvalid is not None:
        hit = hit & qvalid
    return jnp.where(hit, out, 0)


def drop_explicit_zeros(A: ELL, tol: float = 0.0) -> ELL:
    """Remove stored entries with |val| <= tol (keeps the diagonal slot out
    of consideration — pure magnitude filter, diag handled by callers)."""
    keep = (jnp.abs(A.vals) > tol) & A.valid_mask()
    return ell_dedup(A.cols, A.vals, keep, A.shape)
