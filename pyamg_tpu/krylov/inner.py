"""Fixed-iteration inner Krylov smoothers (traceable inside the cycle jit).

Reference: ``smoothing.py`` inner cg/gmres smoothers — a handful of Krylov
steps used as pre/post smoothers.  These run a *fixed* number of iterations
(lax.fori_loop) so they trace to static programs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from pyamg_tpu.ops.spmv import matvec


def inner_cg(A, x, b, iterations):
    r = b - matvec(A, x)
    p = r
    rr = jnp.real(jnp.vdot(r, r))

    def body(i, st):
        x, r, p, rr = st
        Ap = matvec(A, p)
        d = jnp.real(jnp.vdot(p, Ap))
        alpha = rr / jnp.where(d == 0, 1, d)
        x = x + alpha * p
        r = r - alpha * Ap
        rrn = jnp.real(jnp.vdot(r, r))
        beta = rrn / jnp.where(rr == 0, 1, rr)
        p = r + beta * p
        return (x, r, p, rrn)

    x, r, p, rr = lax.fori_loop(0, iterations, body, (x, r, p, rr))
    return x


def inner_gmres(A, x, b, iterations):
    """A few steps of minimal-residual iteration (GMRES(1) repeated) —
    a cheap nonsymmetric smoother."""
    def body(i, x):
        r = b - matvec(A, x)
        Ar = matvec(A, r)
        d = jnp.real(jnp.vdot(Ar, Ar))
        alpha = jnp.vdot(Ar, r) / jnp.where(d == 0, 1, d)
        return x + alpha * r

    return lax.fori_loop(0, iterations, body, x)
