"""Krylov methods: CG, BiCGStab, CGNE, CGNR, CR, MR, steepest descent.

Reference behaviors: ``pyamg/krylov/_cg.py`` (criteria options, curvature
breakdown checks, periodic residual recompute), ``_bicgstab.py``,
``_cgne.py``, ``_cgnr.py``, ``_cr.py``, ``_minimal_residual.py``,
``_steepest_descent.py``.  All run as single jitted ``lax.while_loop``
programs on device (see ``common.py``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pyamg_tpu.krylov.common import (
    as_matvec, as_precond, prepare, finalize, dot, norm, real_dtype)


def _rtol_const(criteria, tol, normb, normMb, fro, x0norm):
    """Stopping threshold; 'rr' and 'MrMr' use constant thresholds."""
    if criteria == "rr":
        return tol * normb
    if criteria == "rr+":
        # reference _cg.py:116-123: ||r|| < tol (||A||_F ||x0|| + ||b||)
        if fro is None:
            raise ValueError(
                "criteria 'rr+' needs a matrix with accessible entries "
                "(||A||_F); got an abstract LinearOperator")
        froA = fro() if callable(fro) else fro
        return tol * (froA * x0norm + normb)
    if criteria == "MrMr":
        return tol * normMb
    if criteria == "rMr":
        return tol
    raise ValueError(f"invalid stopping criteria {criteria!r}")


def _criteria_fns(criteria, tol, b, x0, Mv, fro, allowed):
    """(measure(r), rtol) per the reference's stopping-criteria table
    (``_cg.py:100-130``); raises for criteria a method doesn't admit."""
    if criteria not in allowed:
        raise ValueError(f"invalid stopping criteria {criteria!r}")
    normb = norm(b)
    normb = jnp.where(normb == 0, 1.0, normb)
    if criteria == "rr":
        return norm, tol * normb
    if criteria == "rr+":
        if fro is None:
            raise ValueError(
                "criteria 'rr+' needs a matrix with accessible entries")
        froA = fro() if callable(fro) else fro
        return norm, tol * (froA * norm(x0) + normb)
    if criteria == "MrMr":
        return (lambda r: norm(Mv(r))), tol * norm(Mv(b))
    # rMr
    return (lambda r: jnp.sqrt(jnp.maximum(
        jnp.real(dot(r, Mv(r))), 0.0))), tol


def cg_loop(mv, Mv, x, b, tol, criteria, maxiter, fro=1.0,
            stall_window=8):
    """Traceable preconditioned-CG loop: (x, info, resbuf, nres).

    Factored out so callers (``MultilevelSolver.solve``) can jit ONE
    cached program with the operator pytrees as *arguments* — re-jitting
    per call (and baking the hierarchy in as constants) costs seconds.

    ``stall_window``: stop early when the running-minimum residual has
    not improved by ≥1% for this many iterations.  f32 CG hits its
    rounding floor (~eps32·√cond·‖b‖) well before tight tolerances;
    without this, tight-tol inner solves (iterative refinement) burn the
    full ``maxiter`` making no progress.  Set 0 to disable.
    """
    normb = norm(b)
    normb = jnp.where(normb == 0, 1.0, normb)
    normMb = norm(Mv(b)) if criteria == "MrMr" else jnp.asarray(1.0)
    r = b - mv(x)
    z = Mv(r)
    p = z
    rz = jnp.real(dot(r, z))
    normr0 = norm(r) if criteria != "MrMr" else norm(z)
    rtol = _rtol_const(criteria, tol, normb, normMb, fro, norm(x))
    resbuf = jnp.zeros((maxiter + 1,), real_dtype(b.dtype))
    resbuf = resbuf.at[0].set(norm(r).astype(resbuf.dtype))

    def cond(st):
        (x, r, z, p, rz, it, resbuf, done, info, minr, imp_it, xb) = st
        return (~done) & (it < maxiter)

    def body(st):
        (x, r, z, p, rz, it, resbuf, done, info, minr, imp_it, xb) = st
        Ap = mv(p)
        pAp = jnp.real(dot(Ap, p))
        bad_A = pAp <= 0.0
        alpha = rz / jnp.where(pAp == 0, 1, pAp)
        xn = x + alpha * p
        # periodic true-residual recompute (reference recompute_r=8)
        rn = lax.cond((it + 1) % 8 == 0,
                      lambda _: b - mv(xn),
                      lambda _: r - alpha * Ap, operand=None)
        zn = Mv(rn)
        rzn = jnp.real(dot(rn, zn))
        bad_M = rzn < 0.0
        beta = rzn / jnp.where(rz == 0, 1, rz)
        pn = zn + beta * p
        itn = it + 1
        if criteria == "MrMr":
            normr = norm(zn)
        elif criteria == "rMr":
            normr = jnp.sqrt(jnp.maximum(rzn, 0.0))
        else:
            normr = norm(rn)
        resbuf = resbuf.at[itn].set(norm(rn).astype(resbuf.dtype))
        conv = normr < rtol
        # track the best iterate: the 2-norm residual is non-monotone in
        # (preconditioned) CG, and the stall cutoff below may fire at a
        # local bump — returning the best-seen x keeps outer iterative
        # refinement monotone
        better = normr < minr
        xb = jnp.where(better, xn, xb)
        improved = normr < 0.99 * minr
        minr = jnp.where(better, normr, minr)
        imp_it = jnp.where(improved, itn, imp_it)
        # only call it a stall once real progress has happened: CG's
        # 2-norm residual can grow transiently by ~5x on ill-conditioned
        # systems before converging (it minimizes the A-norm), and the
        # plateau this targets is the f32 floor at the END of convergence
        stalled = (stall_window > 0) & (itn - imp_it >= stall_window) & \
            (minr < 0.1 * normr0)
        done = conv | bad_A | bad_M | stalled
        info = jnp.where(bad_A | bad_M, -1,
                         jnp.where(conv, 0, info))
        return (jnp.where(bad_A, x, xn), rn, zn, pn, rzn, itn,
                resbuf, done, info, minr, imp_it, xb)

    init = (x, r, z, p, rz, jnp.int32(0), resbuf, normr0 < rtol,
            jnp.int32(0), normr0.astype(real_dtype(b.dtype)),
            jnp.int32(0), x)
    (x, r, z, p, rz, it, resbuf, done, info, minr, imp_it, xb) = \
        lax.while_loop(cond, body, init)
    info = jnp.where((info == 0) & (it >= maxiter) & ~done, it, info)
    return xb, info, resbuf, it + 1


def cg(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
       callback=None, residuals=None):
    """Preconditioned conjugate gradient (reference ``krylov/_cg.py:11``).

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.krylov import cg
    >>> A = poisson((10, 10))
    >>> b = np.ones(A.shape[0])
    >>> x, info = cg(A, b, tol=1e-8, maxiter=100)
    >>> info
    0
    >>> from pyamg_tpu.sparse.matrix import to_scipy
    >>> bool(np.linalg.norm(b - to_scipy(A) @ np.asarray(x))
    ...      < 1e-6 * np.linalg.norm(b))
    True
    """
    mv, n, dtype, fro, b, x, maxiter = prepare(A, b, x0, maxiter)
    Mv = as_precond(M)

    if callback is None:
        xf, info, resbuf, nres = jax.jit(
            lambda x, b: cg_loop(mv, Mv, x, b, tol, criteria, maxiter,
                                 fro))(x, b)
        finalize(residuals, resbuf, nres)
        return xf, int(info)
    # host loop variant (callback support)
    r = b - mv(x)
    z = Mv(r)
    p = z
    rz = float(jnp.real(dot(r, z)))
    if residuals is not None:
        residuals[:] = [float(norm(r))]
    rtol = float(_rtol_const(criteria, tol, float(norm(b)) or 1.0,
                             float(norm(Mv(b))), fro, float(norm(x))))
    it = 0
    while True:
        Ap = mv(p)
        pAp = float(jnp.real(dot(Ap, p)))
        if pAp <= 0:
            return x, -1
        alpha = rz / pAp
        x = x + alpha * p
        r = (b - mv(x)) if (it % 8 == 0 and it > 0) else r - alpha * Ap
        z = Mv(r)
        rzn = float(jnp.real(dot(r, z)))
        if rzn < 0:
            return x, -1
        beta = rzn / rz
        rz = rzn
        p = z + beta * p
        it += 1
        nr = float(norm(r))
        if residuals is not None:
            residuals.append(nr)
        callback(x)
        if nr < rtol:
            return x, 0
        if it >= maxiter:
            return x, it


def bicgstab(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
             callback=None, residuals=None):
    """BiCGStab (reference ``krylov/_bicgstab.py``)."""
    mv, n, dtype, fro, b, x, maxiter = prepare(A, b, x0, maxiter)
    Mv = as_precond(M)
    meas, rtol0 = _criteria_fns(criteria, tol, b, x, Mv, fro,
                                ("rr", "rr+"))

    def run(x):
        r = b - mv(x)
        rstar = r
        p = r
        rrstar = dot(rstar, r)
        rtol = rtol0
        resbuf = jnp.zeros((maxiter + 1,), real_dtype(b.dtype))
        resbuf = resbuf.at[0].set(norm(r).astype(resbuf.dtype))

        def cond(st):
            x, r, p, rrstar, it, resbuf, done, info = st
            return (~done) & (it < maxiter)

        def body(st):
            x, r, p, rrstar, it, resbuf, done, info = st
            Mp = Mv(p)
            AMp = mv(Mp)
            denom = dot(rstar, AMp)
            alpha = rrstar / jnp.where(denom == 0, 1, denom)
            s = r - alpha * AMp
            Ms = Mv(s)
            AMs = mv(Ms)
            d2 = jnp.real(dot(AMs, AMs))
            omega = dot(AMs, s) / jnp.where(d2 == 0, 1, d2)
            xn = x + alpha * Mp + omega * Ms
            rn = s - omega * AMs
            rrstar_n = dot(rstar, rn)
            beta = (rrstar_n / jnp.where(rrstar == 0, 1, rrstar)) * \
                (alpha / jnp.where(omega == 0, 1, omega))
            pn = rn + beta * (p - omega * AMp)
            itn = it + 1
            nr = meas(rn)
            resbuf = resbuf.at[itn].set(norm(rn).astype(resbuf.dtype))
            conv = nr < rtol
            brk = (denom == 0) | (omega == 0)
            info = jnp.where(brk, -1, jnp.where(conv, 0, info))
            return xn, rn, pn, rrstar_n, itn, resbuf, conv | brk, info

        normr0 = meas(r)
        init = (x, r, p, rrstar, jnp.int32(0), resbuf, normr0 < rtol,
                jnp.int32(0))
        x, r, p, rrstar, it, resbuf, done, info = lax.while_loop(
            cond, body, init)
        info = jnp.where((info == 0) & (it >= maxiter) & ~done, it, info)
        return x, info, resbuf, it + 1

    xf, info, resbuf, nres = jax.jit(run)(x)
    finalize(residuals, resbuf, nres)
    if callback is not None:
        callback(xf)
    return xf, int(info)


def _normal_equations(A, which):
    """matvecs (A A^H y) or (A^H A x) built from ELL or operator."""
    from pyamg_tpu.sparse.matrix import ELL, BELL
    from pyamg_tpu.ops.spmv import rspmv, matvec as sp_mv
    if isinstance(A, ELL):
        mvA = lambda v: sp_mv(A, v)
        mvAH = lambda v: rspmv(A, jnp.conj(v)) if jnp.iscomplexobj(A.vals) \
            else rspmv(A, v)
        if jnp.iscomplexobj(A.vals):
            mvAH = lambda v: jnp.conj(rspmv(A, jnp.conj(v)))
        return mvA, mvAH
    if isinstance(A, BELL):
        from pyamg_tpu.ops.transpose import btranspose
        AH = btranspose(A, conjugate=True)
        return (lambda v: sp_mv(A, v)), (lambda v: sp_mv(AH, v))
    if hasattr(A, "matvec") and hasattr(A, "rmatvec"):
        return A.matvec, A.rmatvec
    Ad = jnp.asarray(A)
    return (lambda v: Ad @ v), (lambda v: Ad.conj().T @ v)


def cgne(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
         callback=None, residuals=None):
    """CG on the normal equations A A^H y = b, x = A^H y
    (reference ``krylov/_cgne.py``)."""
    mvA, mvAH = _normal_equations(A, "ne")
    _, _, _, _froA = as_matvec(A)

    class _Op:
        shape = (A.shape[0], A.shape[0])
        dtype = A.dtype
        fro = _froA        # 'rr+' scales by the original ||A||_F
        @staticmethod
        def matvec(v):
            return mvA(mvAH(v))

    y, info = cg(_Op, b, x0=None if x0 is None else None, tol=tol,
                 criteria=criteria, maxiter=maxiter, M=M,
                 callback=callback, residuals=residuals)
    return mvAH(y), info


def cgnr(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
         callback=None, residuals=None):
    """CG on A^H A x = A^H b (reference ``krylov/_cgnr.py``)."""
    mvA, mvAH = _normal_equations(A, "nr")
    bn = mvAH(jnp.asarray(b).reshape(-1))
    _, _, _, _froA = as_matvec(A)

    class _Op:
        shape = (A.shape[1], A.shape[1])
        dtype = A.dtype
        fro = _froA        # 'rr+' scales by the original ||A||_F
        @staticmethod
        def matvec(v):
            return mvAH(mvA(v))

    return cg(_Op, bn, x0=x0, tol=tol, criteria=criteria, maxiter=maxiter,
              M=M, callback=callback, residuals=residuals)


def cr(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
       callback=None, residuals=None):
    """Conjugate residual method (reference ``krylov/_cr.py``)."""
    mv, n, dtype, fro, b, x, maxiter = prepare(A, b, x0, maxiter)
    Mv = as_precond(M)
    meas, rtol0 = _criteria_fns(criteria, tol, b, x, Mv, fro,
                                ("rr", "rr+", "MrMr"))

    def run(x):
        r = Mv(b - mv(x))
        p = r
        Ar = mv(r)
        Ap = mv(p)
        rAr = dot(r, Ar)
        rtol = rtol0
        resbuf = jnp.zeros((maxiter + 1,), real_dtype(b.dtype))
        resbuf = resbuf.at[0].set(norm(b - mv(x)).astype(resbuf.dtype))

        def cond(st):
            return (~st[-2]) & (st[4] < maxiter)

        def body(st):
            x, r, p, rAr, it, resbuf, done, info = st
            Ap = mv(p)
            MAp = Mv(Ap)
            d = jnp.real(dot(Ap, MAp))
            alpha = rAr / jnp.where(d == 0, 1, d)
            xn = x + alpha * p
            rn = r - alpha * MAp
            Arn = mv(rn)
            rArn = dot(rn, Arn)
            beta = rArn / jnp.where(rAr == 0, 1, rAr)
            pn = rn + beta * p
            itn = it + 1
            rtrue = b - mv(xn)
            nr = meas(rtrue)
            resbuf = resbuf.at[itn].set(norm(rtrue).astype(resbuf.dtype))
            conv = nr < rtol
            info = jnp.where(conv, 0, info)
            return xn, rn, pn, rArn, itn, resbuf, conv | (d == 0), info

        init = (x, r, p, rAr, jnp.int32(0), resbuf,
                meas(b - mv(x)) < rtol, jnp.int32(0))
        x, r, p, rAr, it, resbuf, done, info = lax.while_loop(
            cond, body, init)
        info = jnp.where((info == 0) & (it >= maxiter) & ~done, it, info)
        return x, info, resbuf, it + 1

    xf, info, resbuf, nres = jax.jit(run)(x)
    finalize(residuals, resbuf, nres)
    if callback is not None:
        callback(xf)
    return xf, int(info)


def minimal_residual(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None,
                     M=None, callback=None, residuals=None):
    """Minimal residual iteration: alpha = <r, Ar>/<Ar, Ar>
    (reference ``krylov/_minimal_residual.py``)."""
    mv, n, dtype, fro, b, x, maxiter = prepare(A, b, x0, maxiter)
    Mv = as_precond(M)
    meas, rtol0 = _criteria_fns(criteria, tol, b, x, Mv, fro,
                                ("rr", "rr+", "MrMr", "rMr"))

    def run(x):
        rtol = rtol0

        def cond(st):
            return (~st[3]) & (st[1] < maxiter)

        def body(st):
            x, it, resbuf, done, info = st
            r = Mv(b - mv(x))
            Ar = mv(r)
            d = jnp.real(dot(Ar, Ar))
            alpha = dot(Ar, r) / jnp.where(d == 0, 1, d)
            xn = x + alpha * r
            itn = it + 1
            rtrue = b - mv(xn)
            nr = meas(rtrue)
            resbuf = resbuf.at[itn].set(norm(rtrue).astype(resbuf.dtype))
            conv = nr < rtol
            return xn, itn, resbuf, conv | (d == 0), \
                jnp.where(conv, 0, info)

        resbuf = jnp.zeros((maxiter + 1,), real_dtype(b.dtype))
        resbuf = resbuf.at[0].set(norm(b - mv(x)).astype(resbuf.dtype))
        init = (x, jnp.int32(0), resbuf, meas(b - mv(x)) < rtol,
                jnp.int32(0))
        x, it, resbuf, done, info = lax.while_loop(cond, body, init)
        info = jnp.where((info == 0) & (it >= maxiter) & ~done, it, info)
        return x, info, resbuf, it + 1

    xf, info, resbuf, nres = jax.jit(run)(x)
    finalize(residuals, resbuf, nres)
    if callback is not None:
        callback(xf)
    return xf, int(info)


def steepest_descent(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None,
                     M=None, callback=None, residuals=None):
    """Steepest descent: alpha = <r, z>/<Az, z>
    (reference ``krylov/_steepest_descent.py``)."""
    mv, n, dtype, fro, b, x, maxiter = prepare(A, b, x0, maxiter)
    Mv = as_precond(M)
    meas, rtol0 = _criteria_fns(criteria, tol, b, x, Mv, fro,
                                ("rr", "rr+", "MrMr", "rMr"))

    def run(x):
        rtol = rtol0

        def cond(st):
            return (~st[3]) & (st[1] < maxiter)

        def body(st):
            x, it, resbuf, done, info = st
            r = b - mv(x)
            z = Mv(r)
            Az = mv(z)
            d = jnp.real(dot(Az, z))
            alpha = dot(r, z) / jnp.where(d == 0, 1, d)
            xn = x + alpha * z
            itn = it + 1
            rtrue = b - mv(xn)
            nr = meas(rtrue)
            resbuf = resbuf.at[itn].set(norm(rtrue).astype(resbuf.dtype))
            conv = nr < rtol
            return xn, itn, resbuf, conv | (d <= 0), \
                jnp.where(conv, 0, jnp.where(d <= 0, -1, info))

        resbuf = jnp.zeros((maxiter + 1,), real_dtype(b.dtype))
        resbuf = resbuf.at[0].set(norm(b - mv(x)).astype(resbuf.dtype))
        init = (x, jnp.int32(0), resbuf, meas(b - mv(x)) < rtol,
                jnp.int32(0))
        x, it, resbuf, done, info = lax.while_loop(cond, body, init)
        info = jnp.where((info == 0) & (it >= maxiter) & ~done, it, info)
        return x, info, resbuf, it + 1

    xf, info, resbuf, nres = jax.jit(run)(x)
    finalize(residuals, resbuf, nres)
    if callback is not None:
        callback(xf)
    return xf, int(info)
