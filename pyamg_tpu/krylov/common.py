"""Shared Krylov plumbing.

Interface contract (reference SURVEY.md §A.11, ``krylov/_cg.py:11``):
``(A, b, x0=None, tol=1e-5, criteria='rr', maxiter=None, M=None,
callback=None, residuals=None) -> (x, info)`` with info=0 success,
>0 iteration count at exit, <0 breakdown.

TPU design: when no Python ``callback`` is given, the entire iteration runs
inside one ``lax.while_loop`` under jit — residual norms are written to a
fixed (maxiter+1,) buffer and copied into the user's ``residuals`` list
afterwards.  With a callback, a host loop over jitted steps is used.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL, DIA
from pyamg_tpu.ops.spmv import matvec as sp_matvec


def as_matvec(A):
    """Normalize A to (matvec, n, dtype, fro_norm_fn)."""
    if isinstance(A, (ELL, BELL)):
        return (lambda v: sp_matvec(A, v)), A.shape[0], A.dtype, \
            (lambda: jnp.sqrt(jnp.sum(jnp.abs(A.vals) ** 2)))
    if isinstance(A, DIA):
        return (lambda v: sp_matvec(A, v)), A.shape[0], A.dtype, \
            (lambda: jnp.sqrt(jnp.sum(jnp.abs(A.data) ** 2)))
    if callable(getattr(A, "matvec", None)):
        n = A.shape[0]
        dt = getattr(A, "dtype", jnp.float64)
        return A.matvec, n, dt, getattr(A, "fro", None)
    if callable(A):
        raise TypeError("pass a LinearOperator-like with .shape, not a bare "
                        "callable")
    A = jnp.asarray(A)
    return (lambda v: A @ v), A.shape[0], A.dtype, \
        (lambda: jnp.sqrt(jnp.sum(jnp.abs(A) ** 2)))


def as_precond(M):
    if M is None:
        return lambda v: v
    if isinstance(M, (ELL, BELL, DIA)):
        return lambda v: sp_matvec(M, v)
    if callable(getattr(M, "matvec", None)):
        return M.matvec
    if callable(M):
        return M
    Md = jnp.asarray(M)
    return lambda v: Md @ v


def prepare(A, b, x0, maxiter):
    mv, n, dtype, fro = as_matvec(A)
    b = jnp.asarray(b).reshape(-1)
    if b.dtype != dtype:
        b = b.astype(dtype)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0).reshape(-1).astype(dtype)
    if maxiter is None:
        maxiter = int(min(max(1.3 * n, 5), 10000))
    return mv, n, dtype, fro, b, x, int(maxiter)


def finalize(residuals, resbuf, nres):
    if residuals is not None:
        buf = np.asarray(resbuf)
        k = int(nres)
        residuals[:] = [float(v) for v in buf[:k]]


def real_dtype(dtype):
    """The real dtype residual norms live in for value dtype ``dtype``.

    Using the value dtype's real twin (not hardcoded f64) keeps the jitted
    loops warning-free when x64 is disabled (the perf path) while still
    giving f64 histories under ``jax_enable_x64`` (the correctness tier).
    """
    return jnp.zeros((), dtype).real.dtype


def dot(a, b):
    """<conj(a), b> (complex-safe)."""
    return jnp.vdot(a, b)


def norm(v):
    return jnp.sqrt(jnp.real(jnp.vdot(v, v)))
