"""GMRES / FGMRES with on-device restart cycles.

Reference behaviors: ``pyamg/krylov/_gmres_mgs.py`` (left-preconditioned,
Givens least squares, residuals are *preconditioned* norms) and
``_fgmres.py`` (flexible, right-preconditioned).

TPU design: the reference's modified Gram-Schmidt is a sequential
j-step dot/axpy chain; here each Arnoldi step orthogonalizes with
*classical Gram-Schmidt applied twice* (CGS2) — two (R+1, n) matmuls on
the MXU, numerically as robust as MGS (Giraud et al. 2005) and vastly
faster on wide vectors.  The whole restart cycle runs in one jitted
``lax.while_loop`` with static buffers V (R+1, n) and H (R+1, R+1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pyamg_tpu.krylov.common import as_matvec, as_precond, prepare, norm


def _givens(a, b):
    """Complex-safe Givens rotation zeroing b: returns (c, s, r)."""
    absa = jnp.abs(a)
    absb = jnp.abs(b)
    r = jnp.sqrt(absa ** 2 + absb ** 2)
    safe = r > 0
    rs = jnp.where(safe, r, 1)
    c = jnp.where(safe, absa / rs, 1.0)
    # phase of a
    pha = jnp.where(absa > 0, a / jnp.where(absa > 0, absa, 1), 1.0)
    s = jnp.where(safe, pha * jnp.conj(b) / rs, 0.0)
    rr = pha * r
    return c, s, jnp.where(safe, rr, a)


def _gmres_cycle(mv, Mv, b, x0, R, rtol, flexible):
    """One restart cycle, jitted. Returns (x, normr, resbuf, niters)."""
    n = b.shape[0]
    dtype = b.dtype

    def cycle(x):
        r0 = b - mv(x)
        r = Mv(r0) if not flexible else r0
        beta = norm(r)
        V = jnp.zeros((R + 1, n), dtype)
        Z = jnp.zeros((R + 1, n), dtype) if flexible else V
        V = V.at[0].set(jnp.where(beta > 0, (r / jnp.where(beta == 0, 1, beta)).astype(dtype), 0))
        H = jnp.zeros((R + 1, R + 1), dtype)
        cs = jnp.ones((R + 1,), jnp.float64)
        sn = jnp.zeros((R + 1,), dtype)
        g = jnp.zeros((R + 1,), dtype).at[0].set(beta.astype(dtype))
        resbuf = jnp.zeros((R + 1,), jnp.float64)

        def cond(st):
            V, Z, H, cs, sn, g, j, done = st
            return (~done) & (j < R)

        def body(st):
            V, Z, H, cs, sn, g, j, done = st
            vj = V[j]
            if flexible:
                zj = Mv(vj)
                Z2 = Z.at[j].set(zj)
                w = mv(zj)
            else:
                Z2 = Z
                w = Mv(mv(vj))
            # CGS2 against rows 0..j (rows > j are zero)
            mask = (jnp.arange(R + 1) <= j).astype(dtype)
            h1 = (jnp.conj(V) @ w) * mask
            w = w - V.T @ h1
            h2 = (jnp.conj(V) @ w) * mask
            w = w - V.T @ h2
            h = h1 + h2
            wnorm = norm(w)
            Hcol = h.at[j + 1].set(wnorm.astype(dtype))
            Vn = V.at[j + 1].set(
                jnp.where(wnorm > 1e-300,
                          (w / jnp.where(wnorm == 0, 1, wnorm)).astype(dtype),
                          0))

            # apply existing rotations to the new column
            def rot_body(i, col):
                hi = col[i]
                hi1 = col[i + 1]
                ci = cs[i]
                si = sn[i]
                new_i = ci * hi + si * hi1
                new_i1 = -jnp.conj(si) * hi + ci * hi1
                col = col.at[i].set(new_i.astype(dtype))
                return col.at[i + 1].set(new_i1.astype(dtype))

            Hcol = lax.fori_loop(0, j, rot_body, Hcol)
            c, s, rr = _givens(Hcol[j], Hcol[j + 1])
            Hcol = Hcol.at[j].set(rr.astype(dtype)).at[j + 1].set(0)
            csn = cs.at[j].set(jnp.real(c).astype(jnp.float64))
            snn = sn.at[j].set(s.astype(dtype))
            gj = g[j]
            gn = g.at[j].set((c * gj).astype(dtype)) \
                 .at[j + 1].set((-jnp.conj(s) * gj).astype(dtype))
            Hn = H.at[:, j].set(Hcol)
            normr = jnp.abs(gn[j + 1])
            done2 = (normr < rtol) | (wnorm <= 1e-300)
            return Vn, Z2, Hn, csn, snn, gn, j + 1, done2

        init = (V, Z, H, cs, sn, g, jnp.int32(0), beta < rtol)
        V, Z, H, cs, sn, g, j, done = lax.while_loop(cond, body, init)

        # solve the j x j triangular system (padded: unit diagonal elsewhere)
        idx = jnp.arange(R + 1)
        active = idx < j
        Hs = jnp.where(active[None, :] & active[:, None], H,
                       jnp.eye(R + 1, dtype=dtype))
        gs = jnp.where(active, g, 0)
        y = jax.scipy.linalg.solve_triangular(Hs, gs, lower=False)
        # left GMRES: x += V y (V spans the M*A Krylov space);
        # FGMRES: x += Z y (Z holds the preconditioned directions)
        basis = Z if flexible else V
        xn = x + basis.T @ jnp.where(active, y, 0)
        normr = jnp.abs(g[j])
        return xn, normr, j

    return jax.jit(cycle)


def _gmres_driver(A, b, x0, tol, restart, maxiter, M, callback, residuals,
                  flexible):
    mv, n, dtype, fro, b, x, _ = prepare(A, b, x0, None)
    Mv = as_precond(M)
    if restart is None:
        R = min(n, maxiter if maxiter is not None else min(n, 40))
        max_outer = 1
    else:
        R = min(int(restart), n)
        max_outer = maxiter if maxiter is not None else max(1, min(
            10000 // max(R, 1), 100))
    normb = float(norm(b))
    if normb == 0.0:
        normMb = 1.0
    else:
        normMb = float(norm(Mv(b))) if not flexible else normb
    r0 = b - mv(x)
    pr0 = Mv(r0) if not flexible else r0
    if residuals is not None:
        residuals[:] = [float(norm(pr0))]
    rtol = tol * normMb
    if float(norm(pr0)) < rtol:
        return x, 0
    cycle = _gmres_cycle(mv, Mv, b, x, R, rtol, flexible)
    it_total = 0
    for _outer in range(max_outer):
        x, normr, j = cycle(x)
        it_total += int(j)
        if residuals is not None:
            # per-cycle end preconditioned residual (implicit norm)
            rr = Mv(b - mv(x)) if not flexible else b - mv(x)
            residuals.append(float(norm(rr)))
        if callback is not None:
            callback(x)
        if float(normr) < rtol:
            rr = Mv(b - mv(x)) if not flexible else b - mv(x)
            if float(norm(rr)) < rtol:
                return x, 0
        if int(j) == 0:
            break
    return x, it_total


def gmres_mgs(A, b, x0=None, tol=1e-5, restart=None, maxiter=None, M=None,
              callback=None, residuals=None, reorth=False, restrt=None):
    """Left-preconditioned GMRES (CGS2 Arnoldi; reference
    ``_gmres_mgs.py:42``)."""
    if restrt is not None:
        restart = restrt
    return _gmres_driver(A, b, x0, tol, restart, maxiter, M, callback,
                         residuals, flexible=False)


def gmres_householder(A, b, x0=None, tol=1e-5, restart=None, maxiter=None,
                      M=None, callback=None, residuals=None, restrt=None):
    """Householder-GMRES API parity (reference ``_gmres_householder.py``).

    On TPU the CGS2 Arnoldi already delivers Householder-class stability at
    matmul speed, so this dispatches to the same cycle kernel.
    """
    return gmres_mgs(A, b, x0=x0, tol=tol, restart=restart, maxiter=maxiter,
                     M=M, callback=callback, residuals=residuals,
                     restrt=restrt)


def gmres(A, b, x0=None, tol=1e-5, restart=None, maxiter=None, M=None,
          callback=None, residuals=None, orthog="mgs", restrt=None, **kwargs):
    """GMRES dispatcher (reference ``_gmres.py``): orthog in
    {'mgs', 'householder', 'cgs2'} all map to the CGS2 device cycle."""
    return gmres_mgs(A, b, x0=x0, tol=tol, restart=restart, maxiter=maxiter,
                     M=M, callback=callback, residuals=residuals,
                     restrt=restrt)


def fgmres(A, b, x0=None, tol=1e-5, restart=None, maxiter=None, M=None,
           callback=None, residuals=None, restrt=None):
    """Flexible GMRES: right-preconditioned, M may vary per iteration
    (reference ``_fgmres.py``)."""
    if restrt is not None:
        restart = restrt
    return _gmres_driver(A, b, x0, tol, restart, maxiter, M, callback,
                         residuals, flexible=True)
