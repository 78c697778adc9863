"""Tentative prolongator via batched per-aggregate QR.

Reference: ``fit_candidates`` (``pyamg/aggregation/tentative.py:9`` +
C++ ``smoothed_aggregation.h:485-610``): per aggregate, orthonormalize the
near-nullspace block with modified Gram-Schmidt, dropping columns whose
post-orthogonalization norm falls below ``tol * pre_norm``.

TPU-native: aggregates are padded to the max size and the MGS runs batched
(vmapped) over all aggregates — K2 (number of candidates) is tiny, so the
sequential column loop is a static unroll.

Output invariants (reference ``smoothed_aggregation.h:440-482``):
``B = Q @ R`` on aggregated rows; rows of unaggregated nodes are zero;
``Q^H Q = I`` over surviving columns.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL


def _membership(AggOp: ELL):
    """(members, labels): members (nagg, m_max) int32 (-1 pad)."""
    n, nagg = AggOp.shape
    has = np.asarray(AggOp.row_nnz) > 0
    labels = np.where(has, np.asarray(AggOp.cols[:, 0]), -1)
    order = np.argsort(labels, kind="stable")
    order = order[labels[order] >= 0]
    sorted_labels = labels[order]
    counts = np.bincount(sorted_labels, minlength=nagg)
    m_max = int(counts.max()) if nagg else 1
    members = np.full((nagg, max(m_max, 1)), -1, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    offs = np.arange(len(order)) - starts[sorted_labels]
    members[sorted_labels, offs] = order
    return members, labels


def _fit_candidates_host(AggOp: ELL, B, tol):
    """Numpy twin of ``fit_candidates`` (setup runs on host: batched MGS
    vectorized over aggregates, zero XLA compiles)."""
    B = np.asarray(B)
    if B.ndim == 1:
        B = B[:, None]
    n, nagg = AggOp.shape
    K2 = B.shape[1]
    K1 = B.shape[0] // n
    assert K1 * n == B.shape[0], "B row count must be a multiple of n"
    dtype = B.dtype

    members, labels = _membership(AggOp)
    m_max = members.shape[1]
    pad = members < 0
    idx = np.where(pad, 0, members)

    Bn = B.reshape(n, K1, K2)
    blk = Bn[idx]                                    # (nagg, m_max, K1, K2)
    blk[pad] = 0
    work = blk.reshape(nagg, m_max * K1, K2).astype(dtype, copy=True)

    Q = np.zeros_like(work)
    R = np.zeros((nagg, K2, K2), dtype)
    for j in range(K2):
        col = work[:, :, j].copy()
        pre = np.sqrt(np.real(np.sum(np.conj(col) * col, axis=1)))
        for i in range(j):
            rij = np.sum(np.conj(Q[:, :, i]) * col, axis=1)
            col -= rij[:, None] * Q[:, :, i]
            R[:, i, j] = rij.astype(dtype)
        nrm = np.sqrt(np.real(np.sum(np.conj(col) * col, axis=1)))
        keep = nrm > tol * pre
        safe = np.where(nrm == 0, 1, nrm)
        Q[:, :, j] = np.where(keep[:, None], col / safe[:, None], 0)
        R[:, j, j] = np.where(keep, nrm, 0).astype(dtype)

    Qb = Q.reshape(nagg, m_max, K1, K2)
    Tblocks = np.zeros((n, K1, K2), dtype)
    Tblocks[idx[~pad]] = Qb[~pad]
    lab = np.where(labels >= 0, labels, 0).astype(np.int32)
    has = labels >= 0
    cols = lab[:, None]
    row_nnz = has.astype(np.int32)
    Bc = R.reshape(nagg * K2, K2)
    if K1 == 1 and K2 == 1:
        vals = np.where(has, Tblocks[:, 0, 0], 0)[:, None]
        return ELL(cols, vals, row_nnz, (n, nagg)), Bc
    vals = np.where(has[:, None, None], Tblocks, 0)[:, None, :, :]
    return BELL(cols, vals, row_nnz, (n * K1, nagg * K2), (K1, K2)), Bc


def fit_candidates(AggOp: ELL, B, tol=1e-10):
    """Return (T, Bc): tentative prolongator (BELL of (K1,K2) node blocks;
    ELL when K1=K2=1) and coarse candidates Bc = R of shape
    (nagg*K2, K2)."""
    from pyamg_tpu.sparse.matrix import is_concrete
    if is_concrete(AggOp.vals, B):
        return _fit_candidates_host(AggOp, B, tol)
    B = jnp.asarray(B)
    if B.ndim == 1:
        B = B[:, None]
    n, nagg = AggOp.shape
    K2 = B.shape[1]
    K1 = B.shape[0] // n
    assert K1 * n == B.shape[0], "B row count must be a multiple of n"
    dtype = B.dtype

    members, labels = _membership(AggOp)
    m_max = members.shape[1]
    mem = jnp.asarray(members)
    pad = mem < 0
    idx = jnp.where(pad, 0, mem)

    # gather aggregate blocks: (nagg, m_max, K1, K2) -> (nagg, m_max*K1, K2)
    Bn = B.reshape(n, K1, K2)
    blk = Bn[idx]                                    # (nagg, m_max, K1, K2)
    blk = jnp.where(pad[:, :, None, None], 0, blk)
    blk = blk.reshape(nagg, m_max * K1, K2)

    def mgs(Bagg):
        # Bagg: (m, K2). returns Q (m, K2), R (K2, K2)
        m = Bagg.shape[0]
        Q = jnp.zeros_like(Bagg)
        R = jnp.zeros((K2, K2), dtype)
        work = Bagg
        for j in range(K2):
            col = work[:, j]
            pre = jnp.sqrt(jnp.real(jnp.vdot(col, col)))
            thresh = tol * pre
            rj = jnp.zeros((K2,), dtype)
            for i in range(j):
                rij = jnp.vdot(Q[:, i], col)
                col = col - rij * Q[:, i]
                rj = rj.at[i].set(rij.astype(dtype))
            nrm = jnp.sqrt(jnp.real(jnp.vdot(col, col)))
            keep = nrm > thresh
            qj = jnp.where(keep, col / jnp.where(nrm == 0, 1, nrm), 0)
            rj = rj.at[j].set(jnp.where(keep, nrm, 0).astype(dtype))
            Q = Q.at[:, j].set(qj.astype(dtype))
            R = R.at[:, j].set(rj)
        return Q, R

    Q, R = jax.vmap(mgs)(blk)        # (nagg, m_max*K1, K2), (nagg, K2, K2)

    # scatter Q back into T node blocks: node mem[a, s] gets block
    # Q[a, s*K1:(s+1)*K1, :]
    Qb = Q.reshape(nagg, m_max, K1, K2)
    Tblocks = jnp.zeros((n, K1, K2), dtype)
    flat_nodes = idx.reshape(-1)
    flat_blocks = jnp.where(pad.reshape(-1)[:, None, None], 0,
                            Qb.reshape(-1, K1, K2))
    # each node belongs to exactly one aggregate slot -> scatter-add safe
    Tblocks = Tblocks.at[flat_nodes].add(flat_blocks)

    lab = jnp.asarray(np.where(labels >= 0, labels, 0), jnp.int32)
    has = jnp.asarray(labels >= 0)
    cols = lab[:, None]
    row_nnz = has.astype(jnp.int32)
    Bc = R.reshape(nagg * K2, K2)

    if K1 == 1 and K2 == 1:
        vals = jnp.where(has, Tblocks[:, 0, 0], 0)[:, None]
        T = ELL(cols, vals, row_nnz, (n, nagg))
        return T, Bc
    vals = jnp.where(has[:, None, None], Tblocks, 0)[:, None, :, :]
    T = BELL(cols, vals, row_nnz, (n * K1, nagg * K2), (K1, K2))
    return T, Bc
