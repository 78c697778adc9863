"""Row get/set helpers for block (BELL) matrices.

Reference ``pyamg/util/bsr_utils.py`` (``bsr_getrow:7``,
``bsr_row_setscalar:62``, ``bsr_row_setvector:108``) operates in place on
scipy BSR; here the containers are immutable JAX pytrees, so the setters
return a new ``BELL``.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import BELL


def bsr_getrow(A: BELL, i: int):
    """Return ``(values, colindices)`` of the nonzeros of scalar row ``i``.

    Mirrors reference ``bsr_utils.py:7-60``: zeros stored inside blocks are
    dropped; column indices are global scalar columns.
    """
    br, bc = A.blocksize
    bi, lr = divmod(int(i), br)
    vals = np.asarray(A.vals[bi, :, lr, :])        # (W, bc)
    cols = np.asarray(A.cols[bi])                  # (W,)
    valid = np.asarray(A.valid_mask()[bi])         # (W,)
    out_v, out_c = [], []
    for w in range(vals.shape[0]):
        if not valid[w]:
            continue
        nz = np.nonzero(vals[w])[0]
        out_v.extend(vals[w][nz].tolist())
        out_c.extend((cols[w] * bc + nz).tolist())
    order = np.argsort(out_c, kind="stable")
    return (np.asarray(out_v)[order].reshape(-1, 1),
            np.asarray(out_c, dtype=np.int32)[order])


def _row_hit(A: BELL, i: int):
    br, bc = A.blocksize
    bi, lr = divmod(int(i), br)
    valid = A.valid_mask()[bi]                     # (W,)
    return bi, lr, valid


def bsr_row_setscalar(A: BELL, i: int, x) -> BELL:
    """Set every stored entry of scalar row ``i`` to the scalar ``x``
    (within the existing block sparsity pattern; reference
    ``bsr_utils.py:62``)."""
    bi, lr, valid = _row_hit(A, i)
    vals = np.array(A.vals)
    valid = np.asarray(valid)
    vals[bi, :, lr, :] = np.where(valid[:, None], x, vals[bi, :, lr, :])
    return dataclasses.replace(A, vals=vals)


def bsr_row_setvector(A: BELL, i: int, x) -> BELL:
    """Overwrite scalar row ``i`` with the dense vector ``x`` restricted to
    the stored block pattern (reference ``bsr_utils.py:108``).

    Entries of ``x`` outside the stored pattern are dropped (the reference
    asserts they are zero; here they are silently ignored to keep the op
    shape-static)."""
    br, bc = A.blocksize
    bi, lr, valid = _row_hit(A, i)
    x = np.asarray(x, A.vals.dtype).reshape(-1)
    vals = np.array(A.vals)
    valid = np.asarray(valid)
    base = np.asarray(A.cols[bi]) * bc             # (W,)
    idx = base[:, None] + np.arange(bc)[None, :]   # (W, bc)
    idx = np.clip(idx, 0, x.shape[0] - 1)
    vals[bi, :, lr, :] = np.where(valid[:, None], x[idx],
                                  vals[bi, :, lr, :])
    return dataclasses.replace(A, vals=vals)
