"""Construct sparse operators from local stencils on regular grids.

Behavioral parity with reference ``pyamg/gallery/stencil.py:8``
(``stencil_grid``): vertices enumerated C-order (last dimension fastest),
zero Dirichlet boundaries (out-of-grid connections dropped).

TPU-native construction: entries are generated per stencil offset as padded
ELL candidate slots with an in-bounds validity mask, then left-compacted —
no scipy spdiags round-trip.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL


def stencil_grid(S, grid, dtype=None, format=None):
    """Sparse operator applying stencil ``S`` at every vertex of ``grid``.

    Returns an ``ELL`` device matrix by default; ``format='csr'`` (or any
    scipy format string) returns the scipy equivalent for interop.
    """
    S = np.asarray(S, dtype=dtype)
    grid = tuple(int(g) for g in grid)
    if len(grid) != S.ndim:
        raise ValueError("stencil dimension must equal number of grid dims")
    if min(grid) < 1:
        raise ValueError("grid dimensions must be positive")
    if any(s % 2 == 0 for s in S.shape):
        raise ValueError("all stencil dimensions must be odd")

    n = int(np.prod(grid))
    strides = np.cumprod([1] + list(reversed(grid)))[:-1][::-1]  # C-order

    # nonzero stencil offsets relative to center
    nz = np.argwhere(S != 0)
    center = np.array([s // 2 for s in S.shape])
    offsets = nz - center                                  # (k, ndim)
    lin_off = offsets @ strides                            # (k,)
    svals = S[tuple(nz.T)]                                 # (k,)
    order = np.argsort(lin_off, kind="stable")
    offsets, lin_off, svals = offsets[order], lin_off[order], svals[order]
    k = len(lin_off)

    # per-vertex coordinates
    coords = np.unravel_index(np.arange(n), grid)          # ndim arrays (n,)
    coords = np.stack(coords, axis=1)                      # (n, ndim)

    # validity: vertex + offset stays in grid along every axis
    tgt = coords[:, None, :] + offsets[None, :, :]         # (n, k, ndim)
    valid = np.all((tgt >= 0) & (tgt < np.array(grid)), axis=2)  # (n, k)

    cand_cols = np.arange(n)[:, None] + lin_off[None, :]   # (n, k)
    cand_vals = np.broadcast_to(svals[None, :], (n, k)).copy()

    # left-compact: stable sort invalid-last keeps column order intact
    key = (~valid).astype(np.int8)
    idx = np.argsort(key, axis=1, kind="stable")
    cols = np.take_along_axis(cand_cols, idx, axis=1)
    vals = np.take_along_axis(cand_vals, idx, axis=1)
    vmask = np.take_along_axis(valid, idx, axis=1)
    cols = np.where(vmask, cols, 0).astype(np.int32)
    vals = np.where(vmask, vals, 0)
    row_nnz = valid.sum(axis=1).astype(np.int32)

    A = ELL(cols, vals, row_nnz, (n, n), grid=grid)
    if format is None:
        return A
    from pyamg_tpu.sparse.matrix import to_scipy
    return to_scipy(A).asformat(format)
