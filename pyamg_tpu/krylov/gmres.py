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


def _cycle(mv, Mv, b, x, R, rtol, flexible, orthog="cgs2"):
    """One traceable restart cycle.

    ``orthog`` selects the Arnoldi orthogonalization: 'cgs2' (classical
    Gram-Schmidt applied twice — two (R+1, n) MXU matmuls per step, the
    TPU-fast default) or 'mgs' (true sequential modified Gram-Schmidt, a
    ``fori_loop`` of j dot+axpy pairs matching the reference
    ``_gmres_mgs.py:42`` iterate-for-iterate in exact arithmetic).

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
        if orthog == "mgs":
            # sequential modified Gram-Schmidt against rows 0..j
            def mgs_body(i, carry):
                wc, hc = carry
                on = i <= j
                hi = jnp.where(on, jnp.vdot(V[i], wc), 0).astype(dtype)
                return wc - hi * V[i], hc.at[i].set(hi)
            w, h = lax.fori_loop(
                0, R + 1, mgs_body, (w, jnp.zeros((R + 1,), dtype)))
        else:
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


def _msign(x):
    """Complex sign with _msign(0) = 1 (reference ``_mysign``,
    ``_gmres_householder.py:13``)."""
    ax = jnp.abs(x)
    return jnp.where(ax == 0, jnp.ones_like(x), x / jnp.where(ax == 0, 1, ax))


def _apply_reflectors(v, W, count, start, descending):
    """Chain-apply Householder reflectors: v <- (I - 2 w w^H) v for
    ``count`` reflectors from row ``start`` of W, in ascending or
    descending row order (reference ``amg_core/krylov.h:38``
    ``apply_householders``).  Sequential by construction (reflectors do
    not commute); each step is one dot + one axpy over n."""
    def body(t, v):
        k = jnp.where(descending, start + count - 1 - t, start + t)
        wk = W[k]
        coef = 2.0 * jnp.vdot(wk, v)
        return v - coef.astype(v.dtype) * wk
    return lax.fori_loop(0, count, body, v)


def _householder_cycle(mv, Mv, b, x, R, rtol):
    """One traceable Householder-GMRES restart cycle (reference
    ``_gmres_householder.py:185-330``).

    The Arnoldi basis is represented implicitly by Householder reflectors
    W: step j builds ``v = P_0..P_j e_j`` (reflector chain), applies the
    preconditioned operator, re-reflects, then forms a NEW reflector
    zeroing v below row j+1 — so the Hessenberg column is exact to
    working precision (Householder's robustness advantage over MGS/CGS2
    on severely ill-conditioned bases).  Returns (xn, normr, j, cycres).
    """
    n = b.shape[0]
    dtype = b.dtype
    rdt = real_dtype(dtype)
    idx = jnp.arange(n)

    r = Mv(b - mv(x))
    normr0 = norm(r)
    beta = (_msign(r[0]) * normr0).astype(dtype)
    w0 = r.at[0].add(beta)
    w0n = norm(w0)
    w0 = jnp.where(w0n > 1e-300,
                   (w0 / jnp.where(w0n == 0, 1, w0n)).astype(dtype), 0)
    W = jnp.zeros((R + 1, n), dtype).at[0].set(w0)
    H = jnp.zeros((R, R), dtype)
    cs = jnp.ones((R,), rdt)
    sn = jnp.zeros((R,), dtype)
    g = jnp.zeros((R + 1,), dtype).at[0].set(-beta)
    cycres = jnp.zeros((R,), rdt)

    def cond(st):
        W, H, cs, sn, g, cycres, j, done = st
        return (~done) & (j < R)

    def body(st):
        W, H, cs, sn, g, cycres, j, done = st
        # v = P_0 P_1 .. P_j e_j, built inside-out: start from
        # (I - 2 w_j w_j^H) e_j then apply P_{j-1}..P_0
        wj = W[j]
        v = (-2.0 * jnp.conj(wj[j])).astype(dtype) * wj
        v = v.at[j].add(1.0)
        v = _apply_reflectors(v, W, j, 0, descending=True)
        v = Mv(mv(v))
        # reflect the new direction into the triangular frame: P_j..P_0 v
        v = _apply_reflectors(v, W, j + 1, 0, descending=False)
        # next reflector zeroes v[j+2:].  Guard j+1 == n (R == n last
        # step): dynamic reads clamp, so read explicitly-safe values
        # (the reference skips this block at inner == n-1).
        jn = jnp.minimum(j + 1, n - 1)
        tail = idx > j
        tail_norm = norm(jnp.where(tail, v, 0))
        alpha = (_msign(v[jn]) * tail_norm).astype(dtype)
        wn_vec = jnp.where(tail, v, 0).at[j + 1].add(alpha)
        wnn = norm(wn_vec)
        wn_vec = jnp.where(wnn > 1e-300,
                           (wn_vec / jnp.where(wnn == 0, 1, wnn))
                           .astype(dtype), 0)
        W2 = W.at[j + 1].set(wn_vec)
        v = v.at[j + 1].set(-alpha)
        v = jnp.where(idx > j + 1, 0, v)

        # previously accumulated Givens rotations
        def rot_body(i, v):
            vi, vi1 = v[i], v[i + 1]
            v = v.at[i].set((cs[i] * vi + sn[i] * vi1).astype(dtype))
            return v.at[i + 1].set(
                (-jnp.conj(sn[i]) * vi + cs[i] * vi1).astype(dtype))

        v = lax.fori_loop(0, j, rot_body, v)
        vj1 = jnp.where(j + 1 < n, v[jn], jnp.zeros((), dtype))
        c, s, rr = _givens(v[j], vj1)
        v = v.at[j].set(rr.astype(dtype)).at[j + 1].set(0)
        cs2 = cs.at[j].set(jnp.real(c).astype(rdt))
        sn2 = sn.at[j].set(s.astype(dtype))
        gj = g[j]
        g2 = g.at[j].set((c * gj).astype(dtype)) \
             .at[j + 1].set((-jnp.conj(s) * gj).astype(dtype))
        H2 = H.at[:, j].set(v[:R])
        normr = jnp.abs(g2[j + 1])
        cyc2 = cycres.at[j].set(normr.astype(rdt))
        breakdown = (tail_norm <= 1e-300) & (jnp.abs(rr) <= 1e-300)
        return (W2, H2, cs2, sn2, g2, cyc2, j + 1,
                (normr < rtol) | breakdown)

    init = (W, H, cs, sn, g, cycres, jnp.int32(0), normr0 < rtol)
    W, H, cs, sn, g, cycres, j, done = lax.while_loop(cond, body, init)

    # y = H[:j,:j]^-1 g[:j]  (padded triangular solve)
    ridx = jnp.arange(R)
    active = ridx < j
    Hs = jnp.where(active[None, :] & active[:, None], H,
                   jnp.eye(R, dtype=dtype))
    dsafe = jnp.abs(jnp.diagonal(Hs)) > 1e-300
    Hs = jnp.where((~dsafe[:, None]) & (ridx[None, :] == ridx[:, None]),
                   jnp.eye(R, dtype=dtype), Hs)
    y = jax.scipy.linalg.solve_triangular(Hs, jnp.where(active, g[:R], 0),
                                          lower=False)
    y = jnp.where(active, y, 0)

    # Horner scheme back to the original space (reference
    # ``householder_hornerscheme``, ``amg_core/krylov.h:107``):
    # update = P_0 (y_0 e_0 + P_1 (y_1 e_1 + ... P_{j-1} y_{j-1} e_{j-1}))
    def horner(t, u):
        k = j - 1 - t
        u = u.at[k].add(y[k])
        wk = W[k]
        coef = 2.0 * jnp.vdot(wk, u)
        return u - coef.astype(dtype) * wk

    update = lax.fori_loop(0, j, horner, jnp.zeros_like(b))
    xn = x + update
    normr = jnp.abs(g[j])
    return xn, normr, j, cycres


def householder_loop(mv, Mv, x, b, tol, R, max_outer):
    """Traceable restarted Householder-GMRES solve: (x, info, resbuf,
    nres).  Same contract as ``gmres_loop``."""
    rdt = real_dtype(b.dtype)
    normMb = norm(Mv(b))
    normMb = jnp.where(normMb == 0, 1.0, normMb)
    rtol = (tol * normMb).astype(rdt)
    npr0 = norm(Mv(b - mv(x)))
    nbuf = max_outer * R + 1
    resbuf = jnp.zeros((nbuf,), rdt).at[0].set(npr0.astype(rdt))

    def cond(st):
        x, it, outer, nres, resbuf, done = st
        return (~done) & (outer < max_outer)

    def body(st):
        x, it, outer, nres, resbuf, done = st
        xn, normr, j, cycres = _householder_cycle(mv, Mv, b, x, R, rtol)
        resbuf = lax.dynamic_update_slice(resbuf, cycres.astype(rdt),
                                          (nres,))
        return (xn, it + j, outer + 1, nres + j, resbuf,
                (normr < rtol) | (j == 0))

    x, it, outer, nres, resbuf, done = lax.while_loop(
        cond, body, (x, jnp.int32(0), jnp.int32(0), jnp.int32(1), resbuf,
                     npr0 < rtol))
    final = norm(Mv(b - mv(x)))
    info = jnp.where(final < rtol, 0, it)
    return x, info, resbuf, nres


def gmres_loop(mv, Mv, x, b, tol, R, max_outer, flexible=False,
               orthog="cgs2"):
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
        xn, normr, j, cycres = _cycle(mv, Mv, b, x, R, rtol, flexible,
                                      orthog)
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
                  flexible, method="cgs2"):
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
        if method == "householder":
            run = jax.jit(lambda x, b: householder_loop(mv, Mv, x, b, tol,
                                                        R, max_outer))
        else:
            run = jax.jit(lambda x, b: gmres_loop(mv, Mv, x, b, tol, R,
                                                  max_outer, flexible,
                                                  method))
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
    if method == "householder":
        cycle = jax.jit(lambda x: _householder_cycle(mv, Mv, b, x, R, rtol))
    else:
        cycle = jax.jit(lambda x: _cycle(mv, Mv, b, x, R, rtol, flexible,
                                         method))
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
    """Left-preconditioned GMRES with true sequential modified
    Gram-Schmidt Arnoldi (reference ``_gmres_mgs.py:42``).

    For TPU-wide vectors prefer ``gmres(orthog='cgs2')``: CGS2 replaces
    the j sequential dot+axpy pairs with two MXU matmuls per step and is
    numerically as robust (Giraud et al. 2005)."""
    if restrt is not None:
        restart = restrt
    return _gmres_driver(A, b, x0, tol, restart, maxiter, M, callback,
                         residuals, flexible=False, method="mgs")


def gmres_householder(A, b, x0=None, tol=1e-5, restart=None, maxiter=None,
                      M=None, callback=None, residuals=None, restrt=None):
    """Householder-GMRES (reference ``_gmres_householder.py:22``).

    True Householder orthogonalization: the Arnoldi basis is held as a
    chain of reflectors (``amg_core/krylov.h:38`` ``apply_householders``)
    and the solution is mapped back by the Horner scheme
    (``krylov.h:107``).  Exact-to-working-precision orthogonality — the
    robust choice for severely ill-conditioned bases.  Each iteration
    applies O(j) sequential dot+axpy reflections, so on TPU it trades
    the CGS2 cycle's MXU-matmul orthogonalization for robustness; prefer
    ``gmres_mgs`` (CGS2) for speed.
    """
    if restrt is not None:
        restart = restrt
    return _gmres_driver(A, b, x0, tol, restart, maxiter, M, callback,
                         residuals, flexible=False, method="householder")


def gmres(A, b, x0=None, tol=1e-5, restart=None, maxiter=None, M=None,
          callback=None, residuals=None, orthog="mgs", restrt=None, **kwargs):
    """GMRES dispatcher (reference ``_gmres.py``): ``orthog`` selects
    'mgs' (true sequential modified Gram-Schmidt), 'cgs2' (classical
    Gram-Schmidt twice — the matmul-shaped device cycle, fastest on TPU),
    or 'householder' (reflector-chain orthogonalization,
    ``gmres_householder``)."""
    if orthog == "householder":
        return gmres_householder(A, b, x0=x0, tol=tol, restart=restart,
                                 maxiter=maxiter, M=M, callback=callback,
                                 residuals=residuals, restrt=restrt)
    if orthog not in ("mgs", "cgs2"):
        raise ValueError(f"unknown orthog {orthog!r}")
    if restrt is not None:
        restart = restrt
    return _gmres_driver(A, b, x0, tol, restart, maxiter, M, callback,
                         residuals, flexible=False, method=orthog)


def fgmres(A, b, x0=None, tol=1e-5, restart=None, maxiter=None, M=None,
           callback=None, residuals=None, restrt=None):
    """Flexible GMRES: right-preconditioned, M may vary per iteration
    (reference ``_fgmres.py``)."""
    if restrt is not None:
        restart = restrt
    return _gmres_driver(A, b, x0, tol, restart, maxiter, M, callback,
                         residuals, flexible=True)
