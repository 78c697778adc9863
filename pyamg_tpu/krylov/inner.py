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


def inner_cgne(A, AH, x, b, iterations):
    """CGNE (Craig's method): CG on A A^H y = b with x = A^H y — fixed
    iterations (reference ``smoothing.py:813`` ``setup_cgne``).  ``AH``
    is the conjugate transpose, precomputed at smoother-setup time (the
    two-phase rule: no operator restructuring inside the jitted cycle).
    """

    def mvH(v):
        return matvec(AH, v)

    r = b - matvec(A, x)
    p = mvH(r)
    rr = jnp.real(jnp.vdot(r, r))

    def body(i, st):
        x, r, p, rr = st
        d = jnp.real(jnp.vdot(p, p))
        alpha = rr / jnp.where(d == 0, 1, d)
        x = x + alpha * p
        r = r - alpha * matvec(A, p)
        rrn = jnp.real(jnp.vdot(r, r))
        beta = rrn / jnp.where(rr == 0, 1, rr)
        p = mvH(r) + beta * p
        return (x, r, p, rrn)

    x, r, p, rr = lax.fori_loop(0, iterations, body, (x, r, p, rr))
    return x


def inner_cgnr(A, AH, x, b, iterations):
    """CGNR: CG on A^H A x = A^H b — fixed iterations (reference
    ``smoothing.py:823`` ``setup_cgnr``).  ``AH`` precomputed at setup.
    """

    def mvH(v):
        return matvec(AH, v)

    r = b - matvec(A, x)
    z = mvH(r)
    p = z
    zz = jnp.real(jnp.vdot(z, z))

    def body(i, st):
        x, r, p, zz = st
        Ap = matvec(A, p)
        d = jnp.real(jnp.vdot(Ap, Ap))
        alpha = zz / jnp.where(d == 0, 1, d)
        x = x + alpha * p
        r = r - alpha * Ap
        z = mvH(r)
        zzn = jnp.real(jnp.vdot(z, z))
        beta = zzn / jnp.where(zz == 0, 1, zz)
        p = z + beta * p
        return (x, r, p, zzn)

    x, r, p, zz = lax.fori_loop(0, iterations, body, (x, r, p, zz))
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
