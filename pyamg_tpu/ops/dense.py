"""Sparse -> dense densification and dense inversion on device.

Coarse multigrid levels below a few thousand unknowns are cheaper as one
dense (MXU) matvec than as a chain of sparse launches; these helpers build
the dense forms without ever materializing n^2 host memory or shipping it
over the host<->device link (the sparse arrays are KBs).

Everything runs inside ONE jit per container signature (eager per-op
dispatch on the setup path costs a compile + tunnel round-trip each).

Reference equivalence: ``coarse_grid_solver('pinv')`` densifies on host
(``/root/reference/pyamg/multilevel.py:717-750``); here the densify and
the LU-based inverse run on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _finish(M, inv):
    if not inv:
        return M
    if inv == "inv_checked":
        # inverse + accuracy probe in ONE compiled program (separate
        # densify/inv/check programs cost ~60 s of cold axon compiles)
        op = jnp.linalg.inv(M)
        n = M.shape[0]
        err = jnp.abs(M @ op - jnp.eye(n, dtype=M.dtype)).max()
        return op, err, M
    return jnp.linalg.inv(M)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _dense_dia(data, offsets, shape, inv):
    n, m = shape
    data = data[:, :n]
    M = jnp.zeros((n, m), data.dtype)
    rows = jnp.arange(n)
    for d, off in enumerate(offsets):
        cols = rows + off
        ok = (cols >= 0) & (cols < m)
        M = M.at[rows, jnp.where(ok, cols, 0)].add(
            jnp.where(ok, data[d], 0))
    return _finish(M, inv)


@partial(jax.jit, static_argnums=(3, 4))
def _dense_ell(cols, vals, row_nnz, shape, inv):
    n, m = shape
    W = cols.shape[1]
    valid = jnp.arange(W)[None, :] < row_nnz[:, None]
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, W))
    M = jnp.zeros((n, m), vals.dtype)
    M = M.at[rows.reshape(-1),
             jnp.where(valid, cols, 0).reshape(-1)].add(
        jnp.where(valid, vals, 0).reshape(-1))
    return _finish(M, inv)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _dense_bell(cols, vals, row_nnz, shape, blocksize, inv):
    n, m = shape
    br, bc = blocksize
    nb, W = cols.shape
    valid = jnp.arange(W)[None, :] < row_nnz[:, None]
    colsz = jnp.where(valid, cols, 0)
    valsz = jnp.where(valid[..., None, None], vals, 0)
    rows = jnp.broadcast_to(jnp.arange(nb)[:, None], (nb, W))
    Mb = jnp.zeros((nb, m // bc, br, bc), vals.dtype)
    Mb = Mb.at[rows.reshape(-1), colsz.reshape(-1)].add(
        valsz.reshape(nb * W, br, bc))
    M = Mb.transpose(0, 2, 1, 3).reshape(n, m)
    return _finish(M, inv)


def _dispatch(A, inv):
    from pyamg_tpu.sparse.matrix import ELL, DIA, BELL
    if isinstance(A, DIA):
        return _dense_dia(jnp.asarray(A.data),
                          tuple(int(o) for o in A.offsets),
                          tuple(A.shape), inv)
    if isinstance(A, BELL):
        return _dense_bell(jnp.asarray(A.cols), jnp.asarray(A.vals),
                           jnp.asarray(A.row_nnz), tuple(A.shape),
                           tuple(A.blocksize), inv)
    if isinstance(A, ELL):
        return _dense_ell(jnp.asarray(A.cols), jnp.asarray(A.vals),
                          jnp.asarray(A.row_nnz), tuple(A.shape), inv)
    # SELL and other containers: fall back through scipy on host
    from pyamg_tpu.sparse.matrix import to_scipy
    M = jnp.asarray(to_scipy(A).toarray())
    return _finish(M, inv)


def to_dense(A):
    """Dense (n, m) device array from an ELL/BELL/DIA container."""
    return _dispatch(A, False)


def inv_device(A):
    """Dense inverse of a sparse container, computed on device (setup)."""
    return _dispatch(A, True)


def inv_device_checked(A):
    """(inverse, max |M @ inv - I|, dense M) in one compiled program."""
    return _dispatch(A, "inv_checked")
