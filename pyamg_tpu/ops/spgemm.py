"""Sparse x sparse matrix products (SpGEMM) — the Galerkin triple product.

Reference behavior: the reference leans on scipy's sequential SMMP CSR
SpGEMM for ``A_coarse = R @ A @ P`` (``classical/classical.py:201``,
``aggregation/aggregation.py:424``) and on a masked C++ SpGEMM
(``smoothed_aggregation.h:970`` ``incomplete_mat_mult_bsr``) for
energy-minimization smoothing.

TPU design — row-expansion SpGEMM:

  For ``C = A @ B`` with pad widths WA, WB, every output row is contained in
  the union of B-rows selected by A's row, at most WA*WB candidates:

      cand_cols[i] = B.cols[A.cols[i, :], :]          (WA, WB)
      cand_vals[i] = A.vals[i, :, None] * B.vals[A.cols[i, :], :]

  then a per-row sort + segment-coalesce (``rowops.dedup_rows``) produces the
  output row.  Fully data-parallel, static shapes; XLA lowers the per-row
  sort to its vectorized sorting network.  Output width is data-dependent,
  so the public entry point compacts on host — SpGEMM is a *setup-phase* op
  (the solve phase only ever runs SpMV).

``masked_spgemm`` computes ``(A @ B)`` restricted to a given sparsity
pattern (the ``incomplete_mat_mult_bsr`` equivalent): same expansion, then
for each pattern slot a membership lookup via searchsorted into the
coalesced candidates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from pyamg_tpu.sparse.matrix import ELL, BELL, is_concrete
from pyamg_tpu.ops.rowops import dedup_rows, compact_width


def _expand(A: ELL, B: ELL):
    """Candidate (cols, vals, valid) of shape (n, WA*WB).

    Unrolled per-A-slot row gathers: a single 2-D indexed gather
    ``B.cols[A.cols]`` costs ~30 ms at (262k, 8, 4) on v5e while WA
    separate 1-D row gathers concatenated along lanes cost ~1 ms — the
    2-D form defeats XLA's vectorized row-gather tiling.
    """
    n = A.shape[0]
    WA, WB = A.width, B.width
    av_ok = A.valid_mask()
    kB = jnp.arange(WB, dtype=jnp.int32)[None, :]
    parts_c, parts_v, parts_ok = [], [], []
    for j in range(WA):
        idx = A.cols[:, j]
        parts_c.append(B.cols[idx])                       # (n, WB)
        parts_v.append(A.vals[:, j:j + 1] * B.vals[idx])
        bok = kB < B.row_nnz[idx][:, None]
        parts_ok.append(av_ok[:, j:j + 1] & bok)
    return (jnp.concatenate(parts_c, axis=1),
            jnp.concatenate(parts_v, axis=1),
            jnp.concatenate(parts_ok, axis=1))


def spgemm(A: ELL, B: ELL, width=None) -> ELL:
    """C = A @ B. Setup-phase (host width compaction).

    Host path: scipy's SMMP SpGEMM (C, zero XLA compiles) — setup runs on
    the host by design; the traced path keeps the row-expansion form.
    """
    assert A.shape[1] == B.shape[0], (A.shape, B.shape)
    shape = (A.shape[0], B.shape[1])
    if is_concrete(A.vals, B.vals):
        from pyamg_tpu.sparse.matrix import to_scipy, ell_from_csr_arrays
        C = (to_scipy(A) @ to_scipy(B)).tocsr()
        C.sum_duplicates()
        C.sort_indices()
        return ell_from_csr_arrays(C.indptr, C.indices, C.data, shape,
                                   width=width)
    cols, vals, valid = _expand(A, B)
    c, v, rn = _dedup_jit(cols, vals, valid, B.shape[1])
    return compact_width(c, v, rn, shape, width=width)


@jax.jit
def _dedup_jit(cols, vals, valid, n_cols):
    return dedup_rows(cols, vals, valid, n_cols)


def masked_spgemm(A: ELL, B: ELL, pattern_cols: jax.Array,
                  pattern_valid: jax.Array) -> jax.Array:
    """vals such that ELL(pattern_cols, vals) == (A @ B) restricted to pattern.

    ``pattern_cols`` must be column-sorted per row (the ELL invariant).
    Entries of A@B outside the pattern are *dropped* (reference semantics:
    ``incomplete_mat_mult_bsr`` only accumulates into pre-existing slots).
    Jittable: all shapes static.
    """
    if is_concrete(A.vals, B.vals, pattern_cols):
        from pyamg_tpu.sparse.matrix import to_scipy
        C = (to_scipy(A) @ to_scipy(B)).tocsr()
        C.sum_duplicates()
        C.sort_indices()
        m = C.shape[1]
        rows = np.repeat(np.arange(C.shape[0]), np.diff(C.indptr))
        # float64 keys: exact up to 2^53 (row*m + col needs ~2*log2(n)
        # bits) and this host runs int64 vector ops ~60x slower than
        # f64/int32; int64 fallback only past the exactness bound
        kdt = np.float64 if C.shape[0] * m < 2 ** 53 else np.int64
        ckey = rows.astype(kdt) * m + C.indices
        pc = np.asarray(pattern_cols)
        pv = np.asarray(pattern_valid)
        qkey = (np.arange(pc.shape[0], dtype=kdt)[:, None] * m
                + pc)
        idx = np.searchsorted(ckey, qkey)
        idx = np.minimum(idx, max(len(ckey) - 1, 0))
        hit = (ckey[idx] == qkey) if len(ckey) else np.zeros(qkey.shape,
                                                             bool)
        out = np.where(hit & pv, C.data[idx] if len(ckey) else 0, 0)
        return out.astype(C.data.dtype)
    cols, vals, valid = _expand(A, B)
    c, v, rn = dedup_rows(cols, vals, valid, B.shape[1])
    # For each pattern slot, find its column among the coalesced candidates.
    # c rows are sorted ascending with a zero tail — tail zeros break
    # searchsorted; re-sentinel the tail (slots >= row_nnz) to n_cols.
    W = c.shape[1]
    k = jnp.arange(W, dtype=jnp.int32)[None, :]
    cs = jnp.where(k < rn[:, None], c, B.shape[1])
    idx = jax.vmap(jnp.searchsorted)(cs, pattern_cols)
    idx = jnp.clip(idx, 0, W - 1)
    hit = jnp.take_along_axis(cs, idx, axis=1) == pattern_cols
    out = jnp.take_along_axis(v, idx, axis=1)
    return jnp.where(hit & pattern_valid, out, 0)


def spgemm_bell(A: BELL, B: BELL, width=None) -> BELL:
    """Block SpGEMM: C = A @ B with conforming blocksizes."""
    assert A.blocksize[1] == B.blocksize[0]
    if is_concrete(A.vals, B.vals):
        from pyamg_tpu.sparse.matrix import to_scipy, bell_from_scipy
        C = (to_scipy(A) @ to_scipy(B)).tobsr(
            (A.blocksize[0], B.blocksize[1]))
        C.sort_indices()
        return bell_from_scipy(C, width=width)
    nb = A.n_block_rows
    WA, WB = A.width, B.width
    br, bc_ = A.blocksize[0], B.blocksize[1]
    av_ok = A.valid_mask()
    kB = jnp.arange(WB, dtype=jnp.int32)[None, :]
    parts_c, parts_v, parts_ok = [], [], []
    for j in range(WA):                 # unrolled 1-D row gathers (see _expand)
        idx = A.cols[:, j]
        parts_c.append(B.cols[idx])                       # (nb, WB)
        bv = B.vals[idx]                                  # (nb, WB, bk, bj)
        parts_v.append(jnp.einsum("nij,nwjk->nwik", A.vals[:, j], bv))
        parts_ok.append(av_ok[:, j:j + 1]
                        & (kB < B.row_nnz[idx][:, None]))
    cand_cols = jnp.concatenate(parts_c, axis=1)
    cand_valid = jnp.concatenate(parts_ok, axis=1)
    cand_vals = jnp.concatenate(parts_v, axis=1)          # (nb, WA*WB, br, bc)
    c, v, rn = _dedup_blocks(cand_cols, cand_vals, cand_valid,
                             B.n_block_cols)
    if width is None:
        width = max(int(jnp.max(rn)) if nb else 0, 1)
    width = min(width, c.shape[1]) if c.shape[1] else 1
    return BELL(c[:, :width], v[:, :width], rn,
                (A.shape[0], B.shape[1]), (br, bc_))


def _dedup_blocks(cols, vals, valid, n_cols):
    """dedup_rows generalized to block values (n, W, br, bc).

    Same scatter-free two-sort scheme as ``rowops.dedup_rows`` (TPU
    scatters serialize); block payloads ride along as permutation indices
    resolved by lane gathers.
    """
    n, W = cols.shape
    sent = jnp.int32(n_cols)
    c = jnp.where(valid, cols.astype(jnp.int32), sent)
    v = jnp.where(valid[:, :, None, None], vals, 0)
    if W == 1:
        rn = (c[:, 0] < sent).astype(jnp.int32)
        return jnp.where(c < sent, c, 0), v, rn
    iota = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (n, W))
    c, perm = jax.lax.sort((c, iota), dimension=1, num_keys=1)
    v = jnp.take_along_axis(v, perm[:, :, None, None], axis=1)
    neq = c[:, 1:] != c[:, :-1]
    head = jnp.concatenate([jnp.ones((n, 1), bool), neq], axis=1) \
        & (c < sent)
    row_nnz = jnp.sum(head, axis=1).astype(jnp.int32)
    s = jnp.cumsum(v, axis=1)
    islast = jnp.concatenate([neq, jnp.ones((n, 1), bool)], axis=1)
    key = (~islast).astype(jnp.int32)
    _, c2, pos2 = jax.lax.sort((key, c, iota), dimension=1, num_keys=1,
                               is_stable=True)
    s2 = jnp.take_along_axis(s, pos2[:, :, None, None], axis=1)
    prev = jnp.concatenate([jnp.zeros_like(s2[:, :1]), s2[:, :-1]], axis=1)
    out_vals = s2 - prev
    k = jnp.arange(W, dtype=jnp.int32)[None, :]
    keep = k < row_nnz[:, None]
    out_cols = jnp.where(keep, c2, 0)
    out_vals = jnp.where(keep[:, :, None, None], out_vals, 0)
    return out_cols, out_vals, row_nnz
