"""GMRES / FGMRES with on-device restart cycles.

Reference behaviors: ``pyamg/krylov/_gmres_mgs.py`` (left-preconditioned,
Givens least squares, residuals are *preconditioned* norms) and
``_fgmres.py`` (flexible, right-preconditioned).

TPU design: the reference's modified Gram-Schmidt is a sequential
j-step dot/axpy chain; here each Arnoldi step orthogonalizes with
*classical Gram-Schmidt applied twice* (CGS2) — two (R+1, n) matmuls on
the MXU, numerically as robust as MGS (Giraud et al. 2005) and vastly
faster on wide vectors.  The whole solve (restart cycles included) is a
single traceable program (``gmres_loop``): an outer ``lax.while_loop``
over restarts around an inner ``lax.while_loop`` over Arnoldi steps —
so callers like ``MultilevelSolver`` can jit ONE cached program with the
hierarchy pytrees as arguments instead of re-tracing per call.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pyamg_tpu.krylov.common import (as_matvec, as_precond, prepare, norm,
                                     real_dtype)


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


def _cycle(mv, Mv, b, x, R, rtol, flexible):
    """One traceable restart cycle.

    Returns ``(xn, normr, j, cycres)`` where ``cycres`` is the (R,) buffer
    of per-inner-iteration preconditioned residual norms (|g[j+1]| — the
    implicit norms the reference records, ``_gmres_mgs.py``) with entries
    past ``j`` zeroed.
    """
    n = b.shape[0]
    dtype = b.dtype
    rdt = real_dtype(dtype)

    r0 = b - mv(x)
    r = Mv(r0) if not flexible else r0
    beta = norm(r)
    V = jnp.zeros((R + 1, n), dtype)
    Z = jnp.zeros((R + 1, n), dtype) if flexible else V
    V = V.at[0].set(jnp.where(
        beta > 0, (r / jnp.where(beta == 0, 1, beta)).astype(dtype), 0))
    H = jnp.zeros((R + 1, R + 1), dtype)
    cs = jnp.ones((R + 1,), rdt)
    sn = jnp.zeros((R + 1,), dtype)
    g = jnp.zeros((R + 1,), dtype).at[0].set(beta.astype(dtype))
    cycres = jnp.zeros((R,), rdt)

    def cond(st):
        V, Z, H, cs, sn, g, cycres, j, done, stall = st
        return (~done) & (j < R)

    def body(st):
        V, Z, H, cs, sn, g, cycres, j, done, stall = st
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
        csn = cs.at[j].set(jnp.real(c).astype(rdt))
        snn = sn.at[j].set(s.astype(dtype))
        gj = g[j]
        gn = g.at[j].set((c * gj).astype(dtype)) \
             .at[j + 1].set((-jnp.conj(s) * gj).astype(dtype))
        Hn = H.at[:, j].set(Hcol)
        normr = jnp.abs(gn[j + 1])
        cyn = cycres.at[j].set(normr.astype(rdt))
        # f32 stall guard: the implicit norm is non-increasing, so no
        # meaningful drop over several steps means the rounding floor
        prev = jnp.where(j > 0, cycres[jnp.maximum(j - 1, 0)],
                         beta.astype(rdt))
        stall2 = jnp.where(normr > 0.999 * prev, stall + 1, 0)
        done2 = (normr < rtol) | (wnorm <= 1e-300) | (stall2 >= 4)
        return Vn, Z2, Hn, csn, snn, gn, cyn, j + 1, done2, stall2

    init = (V, Z, H, cs, sn, g, cycres, jnp.int32(0), beta < rtol,
            jnp.int32(0))
    V, Z, H, cs, sn, g, cycres, j, done, _ = lax.while_loop(
        cond, body, init)

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
    return xn, normr, j, cycres


def gmres_loop(mv, Mv, x, b, tol, R, max_outer, flexible=False):
    """Traceable restarted-GMRES solve: (x, info, resbuf, nres).

    Factored out (like ``cg_loop``) so ``MultilevelSolver.solve`` can jit
    ONE cached program with the hierarchy pytrees as arguments — building
    a fresh jit per call costs minutes of retracing on deep hierarchies.

    ``resbuf`` collects the per-inner-iteration *preconditioned* residual
    norms (reference semantics, ``_gmres_mgs.py``); entry 0 is the initial
    preconditioned residual.
    """
    rdt = real_dtype(b.dtype)
    normMb = norm(Mv(b)) if not flexible else norm(b)
    normMb = jnp.where(normMb == 0, 1.0, normMb)
    rtol = (tol * normMb).astype(rdt)
    r0 = b - mv(x)
    pr0 = Mv(r0) if not flexible else r0
    npr0 = norm(pr0)
    nbuf = max_outer * R + 1
    resbuf = jnp.zeros((nbuf,), rdt).at[0].set(npr0.astype(rdt))

    def cond(st):
        x, it, outer, nres, resbuf, done = st
        return (~done) & (outer < max_outer)

    def body(st):
        x, it, outer, nres, resbuf, done = st
        xn, normr, j, cycres = _cycle(mv, Mv, b, x, R, rtol, flexible)
        # entries past j are zero; they land beyond nres+j and are either
        # overwritten next cycle or ignored by the nres count
        resbuf = lax.dynamic_update_slice(resbuf, cycres.astype(rdt),
                                          (nres,))
        stalled = j == 0
        return (xn, it + j, outer + 1, nres + j, resbuf,
                (normr < rtol) | stalled)

    x, it, outer, nres, resbuf, done = lax.while_loop(
        cond, body, (x, jnp.int32(0), jnp.int32(0), jnp.int32(1), resbuf,
                     npr0 < rtol))
    # info: 0 on convergence, iteration count otherwise (reference contract)
    final = norm(Mv(b - mv(x))) if not flexible else norm(b - mv(x))
    info = jnp.where(final < rtol, 0, it)
    return x, info, resbuf, nres


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

    if callback is None:
        run = jax.jit(lambda x, b: gmres_loop(mv, Mv, x, b, tol, R,
                                              max_outer, flexible))
        x, info, resbuf, nres = run(x, b)
        if residuals is not None:
            k = int(nres)
            residuals[:] = [float(v) for v in np.asarray(resbuf)[:k]]
        return x, int(info)

    # host loop over jitted cycles so the callback fires per restart
    normMb = float(norm(Mv(b))) if not flexible else float(norm(b))
    rtol = tol * (normMb if normMb != 0 else 1.0)
    r0 = b - mv(x)
    pr0 = Mv(r0) if not flexible else r0
    if residuals is not None:
        residuals[:] = [float(norm(pr0))]
    if float(norm(pr0)) < rtol:
        return x, 0
    cycle = jax.jit(lambda x: _cycle(mv, Mv, b, x, R, rtol, flexible))
    it_total = 0
    for _outer in range(max_outer):
        x, normr, j, cycres = cycle(x)
        it_total += int(j)
        if residuals is not None:
            residuals.extend(float(v) for v in np.asarray(cycres)[:int(j)])
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
    """Householder-GMRES (reference ``_gmres_householder.py``).

    The reference zeroes each Arnoldi vector's trailing entries with exact
    Householder reflectors (``amg_core/krylov.h:38,107``).  On TPU that
    per-entry reflector chain is sequential and gather-bound, so this runs
    the same matmul-shaped CGS2 Arnoldi cycle — which delivers
    Householder-class orthogonality (tests/test_krylov.py asserts
    ``||V^H V - I||`` parity on ill-conditioned cases) at MXU speed.  A
    ``PendingDeprecationWarning``-style notice is NOT raised here because
    this name is an intentional algorithm substitution; it IS raised from
    the ``gmres(orthog='householder')`` dispatcher where the reference
    would behave numerically differently per-iterate.
    """
    return gmres_mgs(A, b, x0=x0, tol=tol, restart=restart, maxiter=maxiter,
                     M=M, callback=callback, residuals=residuals,
                     restrt=restrt)


def gmres(A, b, x0=None, tol=1e-5, restart=None, maxiter=None, M=None,
          callback=None, residuals=None, orthog="mgs", restrt=None, **kwargs):
    """GMRES dispatcher (reference ``_gmres.py``): orthog in
    {'mgs', 'householder', 'cgs2'} all map to the CGS2 device cycle.

    ``orthog='householder'`` warns: iterates match the reference only at
    the convergence level (same Krylov space, different orthogonalization
    rounding), not bitwise.
    """
    if orthog == "householder":
        import warnings
        warnings.warn("orthog='householder' runs the CGS2 Arnoldi cycle "
                      "on TPU (reflector chains are sequential); iterates "
                      "agree with the reference's Householder variant at "
                      "convergence-behavior level, not bitwise",
                      stacklevel=2)
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
