"""Multigrid hierarchy and cycling (reference ``pyamg/multilevel.py``).

Design (TPU-first):

* A ``Level`` holds device-array operators (ELL/BELL) plus smoother
  descriptors ``(kind, static_opts, params)``; all dynamic data lives in a
  pytree so the complete multigrid cycle jits once and replays as a single
  XLA program — the solve phase never touches the host.
* The V/W/F/AMLI recursion is unrolled over the (static) hierarchy depth at
  trace time (reference recursion: ``multilevel.py:584-662``).
* ``solve`` runs standalone cycling inside one ``lax.while_loop``; with
  ``accel=`` it wraps the cycle as a preconditioner for the on-device
  Krylov methods (reference ``multilevel.py:398-535``).
* Coarse solves are precomputed factorizations applied as dense ops
  (reference ``coarse_grid_solver`` caches factorizations,
  ``multilevel.py:665-826``).
"""

from __future__ import annotations

import warnings
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pyamg_tpu.sparse.matrix import ELL, BELL, to_scipy
from pyamg_tpu.ops.spmv import matvec
from pyamg_tpu.relaxation.smoothing import apply_smoother, change_smoothers


class Level:
    """One grid level: A (+ P/R below the coarsest) and smoothers.

    Mirrors reference ``multilevel.py:128`` ``Level`` (attribute bag).
    """

    def __init__(self, A=None, P=None, R=None):
        self.A = A
        self.P = P
        self.R = R
        self.pre = ("none", {}, {})
        self.post = ("none", {}, {})

    @property
    def nnz(self):
        return self.A.nnz


class CoarseSolver:
    """Factory-configured coarsest-level solver with cached factorization
    (reference ``coarse_grid_solver``, ``multilevel.py:665-826``)."""

    def __init__(self, kind="pinv", opts=None):
        if isinstance(kind, tuple):
            kind, opts = kind
        self.kind = kind if kind is not None else "pinv"
        self.opts = dict(opts or {})
        self.params = {}

    def setup(self, A):
        kind = self.kind
        if callable(kind):
            self.params = {}
            return
        if kind in ("pinv", "pinv2"):
            Ad = to_scipy(A).toarray()      # host factorization (setup)
            self.params = {"op": np.linalg.pinv(Ad)}
        elif kind in ("lu", "splu"):
            import scipy.linalg
            Ad = to_scipy(A).toarray()
            lu, piv = scipy.linalg.lu_factor(Ad)
            self.params = {"lu": lu, "piv": piv.astype(np.int32)}
        elif kind == "cholesky":
            import scipy.linalg
            Ad = to_scipy(A).toarray()
            c, lower = scipy.linalg.cho_factor(Ad)
            self._cho_lower = bool(lower)   # static: must not be traced
            self.params = {"c": c}
        elif kind in ("jacobi", "gauss_seidel", "block_jacobi",
                      "block_gauss_seidel", "schwarz", "none"):
            from pyamg_tpu.relaxation.smoothing import make_smoother
            it = self.opts.pop("iterations", 10)
            skind, sopts, sparams = make_smoother(
                None, A, (kind, {"iterations": it, **self.opts}))
            self._smoother_static = (skind, sopts)  # strings stay static
            self.params = {"smoother_params": sparams}
        elif kind in ("cg", "gmres"):
            self.params = {"maxiter": int(self.opts.get("maxiter", 30))}
        else:
            raise ValueError(f"unknown coarse solver {kind!r}")

    def __call__(self, A, b):
        kind = self.kind
        if callable(kind):
            return kind(A, b)
        if kind in ("pinv", "pinv2"):
            return self.params["op"] @ b
        if kind in ("lu", "splu"):
            return jax.scipy.linalg.lu_solve(
                (self.params["lu"], self.params["piv"]), b)
        if kind == "cholesky":
            return jax.scipy.linalg.cho_solve(
                (self.params["c"], self._cho_lower), b)
        if kind == "none":
            return jnp.zeros_like(b)
        if kind in ("jacobi", "gauss_seidel", "block_jacobi",
                    "block_gauss_seidel", "schwarz"):
            k, s = self._smoother_static
            p = self.params["smoother_params"]
            return apply_smoother(k, s, p, A, jnp.zeros_like(b), b)
        if kind == "cg":
            from pyamg_tpu.krylov.inner import inner_cg
            return inner_cg(A, jnp.zeros_like(b), b, self.params["maxiter"])
        if kind == "gmres":
            from pyamg_tpu.krylov.inner import inner_gmres
            return inner_gmres(A, jnp.zeros_like(b), b,
                               self.params["maxiter"])
        raise ValueError(kind)


def coarse_grid_solver(solver):
    """Return a CoarseSolver (API parity with reference
    ``multilevel.py:665``); ``.setup(A)`` then call ``(A, b)``."""
    return CoarseSolver(solver)


class MultilevelSolver:
    """Multigrid hierarchy (reference ``MultilevelSolver``,
    ``multilevel.py:17``)."""

    def __init__(self, levels, coarse_solver="pinv"):
        self.levels = levels
        self.coarse_solver = coarse_grid_solver(coarse_solver)
        self.coarse_solver.setup(levels[-1].A)
        self.symmetric_smoothing = False
        self._cycle_cache = {}

    # -- complexity metrics (reference multilevel.py:211-318) --------------
    def operator_complexity(self):
        return sum(l.A.nnz for l in self.levels) / self.levels[0].A.nnz

    def grid_complexity(self):
        return sum(l.A.shape[0] for l in self.levels) / \
            self.levels[0].A.shape[0]

    def cycle_complexity(self, cycle="V"):
        """Work per (1,1)-cycle in units of fine-grid nnz — exact
        semantics of reference ``multilevel.py:211-284``: each level
        visit costs 2*nnz (pre+post smoothing at one nnz each), the
        coarsest solve costs its nnz; V/W/F recursions differ in how
        often coarser levels are visited (AMLI counts as W)."""
        cycle = str(cycle).upper()
        nnz = [l.A.nnz for l in self.levels]
        nlev = len(nnz)

        def V(level):
            if nlev == 1:
                return nnz[0]
            if level == nlev - 2:
                return 2 * nnz[level] + nnz[level + 1]
            return 2 * nnz[level] + V(level + 1)

        def W(level):
            if nlev == 1:
                return nnz[0]
            if level == nlev - 2:
                return 2 * nnz[level] + nnz[level + 1]
            return 2 * nnz[level] + 2 * W(level + 1)

        def F(level):
            if nlev == 1:
                return nnz[0]
            if level == nlev - 2:
                return 2 * nnz[level] + nnz[level + 1]
            return 2 * nnz[level] + F(level + 1) + V(level + 1)

        if cycle == "V":
            flops = V(0)
        elif cycle in ("W", "AMLI"):
            flops = W(0)
        elif cycle == "F":
            flops = F(0)
        else:
            raise TypeError(f"unrecognized cycle type {cycle!r}")
        return float(flops) / float(nnz[0])

    def setup_timings(self):
        """Aggregate per-phase setup wall times across levels (seconds).

        Phases are recorded by the hierarchy constructors
        (strength/aggregate-or-split/fit/smooth/interpolate/rap); empty
        dict when the hierarchy was built another way.
        """
        out = {}
        for l in self.levels:
            for k, v in getattr(l, "_setup_timings", {}).items():
                out[k] = out.get(k, 0.0) + v
        return out

    def __repr__(self):
        lines = [f"MultilevelSolver",
                 f"Number of Levels:     {len(self.levels)}",
                 f"Operator Complexity: {self.operator_complexity():6.3f}",
                 f"Grid Complexity:     {self.grid_complexity():6.3f}",
                 "  level   unknowns     nonzeros"]
        total_nnz = sum(l.A.nnz for l in self.levels)
        for i, l in enumerate(self.levels):
            lines.append(f"{i:6d} {l.A.shape[0]:10d} {l.A.nnz:12d} "
                         f"[{100.0 * l.A.nnz / total_nnz:5.2f}%]")
        return "\n".join(lines)

    # -- dynamic parameter pytree ------------------------------------------
    def _dyn(self):
        lv = tuple((l.A, l.P, l.R, l.pre[2], l.post[2])
                   for l in self.levels[:-1])
        return (lv, self.levels[-1].A, self.coarse_solver.params)

    def _static_key(self):
        return tuple((l.pre[0], tuple(sorted(l.pre[1].items())),
                      l.post[0], tuple(sorted(l.post[1].items())))
                     for l in self.levels[:-1])

    # -- cycle construction -------------------------------------------------
    def _make_cycle(self, cycle, cycles_per_level=1):
        """Build a jittable cycle(dyn, x, b) closure; recursion unrolled."""
        cycle = str(cycle).upper()
        nlev = len(self.levels)
        pres = [l.pre for l in self.levels[:-1]]
        posts = [l.post for l in self.levels[:-1]]
        csolve = self.coarse_solver

        def coarse_apply(Ac, cparams, b):
            # rebind cached params (pytree leaves) for jit correctness
            old = csolve.params
            csolve.params = cparams
            try:
                return csolve(Ac, b)
            finally:
                csolve.params = old

        def go(dyn, lvl, x, b, cyc):
            lv, Ac, cparams = dyn
            A, P, R, prep, postp = lv[lvl]
            pk, ps, _ = pres[lvl]
            qk, qs, _ = posts[lvl]
            x = apply_smoother(pk, ps, prep, A, x, b)
            r = b - matvec(A, x)
            bc = matvec(R, r)
            xc = jnp.zeros_like(bc)
            if lvl == nlev - 2:
                xc = coarse_apply(Ac, cparams, bc)
            elif cyc == "V":
                xc = go(dyn, lvl + 1, xc, bc, "V")
            elif cyc == "W":
                xc = go(dyn, lvl + 1, xc, bc, "W")
                xc = go(dyn, lvl + 1, xc, bc, "W")
            elif cyc == "F":
                xc = go(dyn, lvl + 1, xc, bc, "F")
                for _ in range(cycles_per_level):
                    xc = go(dyn, lvl + 1, xc, bc, "V")
            elif cyc == "AMLI":
                # nAMLI=2 A-orthogonalized corrections
                # (reference multilevel.py:630-656)
                Acoarse = lv[lvl + 1][0] if lvl + 1 < nlev - 1 else Ac
                nAMLI = 2
                ps_list = []
                bcur = bc
                for k in range(nAMLI):
                    pk_vec = go(dyn, lvl + 1, jnp.zeros_like(bc), bcur,
                                "AMLI")
                    for pj in ps_list:
                        Apk = matvec(Acoarse, pk_vec)
                        beta = jnp.vdot(pj, Apk) / \
                            jnp.vdot(pj, matvec(Acoarse, pj))
                        pk_vec = pk_vec - beta * pj
                    Apk = matvec(Acoarse, pk_vec)
                    denom = jnp.vdot(pk_vec, Apk)
                    alpha = jnp.vdot(pk_vec, bcur) / \
                        jnp.where(denom == 0, 1, denom)
                    xc = xc + alpha * pk_vec
                    bcur = bcur - alpha * Apk
                    ps_list.append(pk_vec)
            else:
                raise TypeError(f"unrecognized cycle type {cyc!r}")
            x = x + matvec(P, xc)
            x = apply_smoother(qk, qs, postp, A, x, b)
            return x

        def cyc_fn(dyn, x, b):
            if nlev == 1:      # degenerate hierarchy: direct coarse solve
                _, Ac, cparams = dyn
                return coarse_apply(Ac, cparams, b)
            return go(dyn, 0, x, b, cycle)

        return cyc_fn

    def _get_accel_run(self, accel, cycle, tol, maxiter, criteria="rr"):
        """Jitted Krylov-accelerated solve (dyn, x, b) -> (x, info, resbuf,
        n), cached on the hierarchy's static structure.  Supported accel:
        'cg' (cg_loop) and 'gmres'/'fgmres' (gmres_loop) — the loop body
        takes the hierarchy pytrees as *arguments*, so repeat solves (and
        every iterative-refinement outer) replay one compiled program."""
        key = ("accel_" + accel, str(cycle).upper(), float(tol),
               int(maxiter), criteria, self._static_key(),
               self.coarse_solver.kind if not callable(self.coarse_solver.kind)
               else id(self.coarse_solver.kind))
        if key not in self._cycle_cache:
            cyc = self._make_cycle(cycle)
            nlev = len(self.levels)

            if accel == "cg":
                from pyamg_tpu.krylov.methods import cg_loop

                def run(dyn, x, b):
                    A0 = dyn[0][0][0] if nlev > 1 else dyn[1]
                    mv = lambda v: matvec(A0, v)
                    Mv = lambda r: cyc(dyn, jnp.zeros_like(r), r)
                    return cg_loop(mv, Mv, x, b, tol, criteria, maxiter)
            elif accel in ("gmres", "fgmres"):
                from pyamg_tpu.krylov.gmres import gmres_loop
                n = self.levels[0].A.shape[0]
                R = min(n, int(maxiter))

                def run(dyn, x, b):
                    A0 = dyn[0][0][0] if nlev > 1 else dyn[1]
                    mv = lambda v: matvec(A0, v)
                    Mv = lambda r: cyc(dyn, jnp.zeros_like(r), r)
                    return gmres_loop(mv, Mv, x, b, tol, R, 1,
                                      flexible=(accel == "fgmres"))
            else:
                raise ValueError(accel)

            self._cycle_cache[key] = jax.jit(run)
        return self._cycle_cache[key]

    def _get_standalone_run(self, cycle, cycles_per_level, tol, maxiter):
        """Jitted standalone cycling (dyn, x, b) -> (x, it, resbuf),
        cached on the hierarchy's static structure."""
        key = ("standalone", str(cycle).upper(), cycles_per_level,
               float(tol), int(maxiter), self._static_key(),
               self.coarse_solver.kind if not callable(self.coarse_solver.kind)
               else id(self.coarse_solver.kind))
        if key not in self._cycle_cache:
            cyc = self._make_cycle(cycle, cycles_per_level)
            nlev = len(self.levels)

            def run(dyn, x, b):
                A0 = dyn[0][0][0] if nlev > 1 else dyn[1]
                normb = jnp.sqrt(jnp.real(jnp.vdot(b, b)))
                rtol = tol * jnp.where(normb == 0, 1.0, normb)
                r0 = b - matvec(A0, x)
                nr0 = jnp.sqrt(jnp.real(jnp.vdot(r0, r0)))
                resbuf = jnp.zeros((maxiter + 1,), nr0.dtype)
                resbuf = resbuf.at[0].set(nr0)

                def cond(st):
                    x, it, resbuf, done = st
                    return (~done) & (it < maxiter)

                def body(st):
                    x, it, resbuf, done = st
                    x = cyc(dyn, x, b)
                    r = b - matvec(A0, x)
                    nr = jnp.sqrt(jnp.real(jnp.vdot(r, r)))
                    it = it + 1
                    resbuf = resbuf.at[it].set(nr.astype(resbuf.dtype))
                    return x, it, resbuf, nr < rtol

                x, it, resbuf, done = lax.while_loop(
                    cond, body, (x, jnp.int32(0), resbuf, nr0 < rtol))
                return x, it, resbuf

            self._cycle_cache[key] = jax.jit(run)
        return self._cycle_cache[key]

    def _get_cycle(self, cycle, cycles_per_level=1):
        key = (str(cycle).upper(), cycles_per_level, self._static_key(),
               self.coarse_solver.kind if not callable(self.coarse_solver.kind)
               else id(self.coarse_solver.kind))
        if key not in self._cycle_cache:
            self._cycle_cache[key] = self._make_cycle(cycle, cycles_per_level)
        return self._cycle_cache[key]

    def trace_cycle(self, path, cycle="V", iterations=10):
        """Record ``iterations`` V-cycle applications under
        ``jax.profiler.trace`` into ``path`` (view with TensorBoard /
        xprof).  The TPU-native analogue of the reference's (absent)
        tracing story — per-op device timelines for the solve phase."""
        cyc = self._get_cycle(cycle)
        dyn = self._dyn()
        n = self.levels[0].A.shape[0]
        b = jnp.ones((n,), self.levels[0].A.dtype)

        @jax.jit
        def run(dyn, b):
            x = lax.fori_loop(0, iterations,
                              lambda i, v: cyc(dyn, v, b),
                              jnp.zeros_like(b))
            return jnp.sum(x)

        float(run(dyn, b))                    # compile outside the trace
        with jax.profiler.trace(str(path)):
            float(run(dyn, b))
        return path

    def profile_cycle(self, cycle="V", k1=10, k2=60):
        """Wall-time one cycle application via a two-point jitted-loop
        measurement ((t(k2)-t(k1))/(k2-k1), value-forced), which excludes
        the fixed dispatch+fetch overhead.  Returns seconds."""
        import time as _time
        cyc = self._get_cycle(cycle)
        dyn = self._dyn()
        n = self.levels[0].A.shape[0]
        b = jnp.ones((n,), self.levels[0].A.dtype)

        def timed(K):
            @jax.jit
            def run(dyn, b):
                x = lax.fori_loop(0, K, lambda i, v: cyc(dyn, v, b),
                                  jnp.zeros_like(b))
                return jnp.sum(x)

            float(run(dyn, b))
            ts = []
            for _ in range(3):
                t0 = _time.perf_counter()
                float(run(dyn, b))
                ts.append(_time.perf_counter() - t0)
            return min(ts)

        return (timed(k2) - timed(k1)) / (k2 - k1)

    # -- public API ----------------------------------------------------------
    def aspreconditioner(self, cycle="V"):
        """One cycle from zero guess as a linear operator
        (reference ``multilevel.py:355-396``)."""
        cyc = self._get_cycle(cycle)
        dyn = self._dyn()
        A0 = self.levels[0].A
        outer = self

        class _M:
            shape = A0.shape
            dtype = A0.dtype

            @staticmethod
            def matvec(r):
                return cyc(dyn, jnp.zeros_like(r), r)

            def __matmul__(self, r):
                return cyc(dyn, jnp.zeros_like(r), r)

        return _M()

    def psolve(self, b):
        return self.aspreconditioner().matvec(jnp.asarray(b))

    def compress_stencils(self, max_diags=64, sell=True):
        """Convert operators to their gather-free / fused-kernel layouts:

        * square ELL levels with narrow offset structure -> ``DIA``
          (banded; SpMV = shifted elementwise products),
        * grid-tagged transfer operators P/R -> ``PhaseStencil``
          (per-phase shifted products on the coarse grid), and
        * everything else with clustered quasi-diagonal structure ->
          ``SELL`` (single-Pallas-kernel windowed lane-gather SpMV and
          fused Gauss-Seidel sweeps; ``sparse/sell.py``).

        Together these remove every XLA gather from the V-cycle — the
        TPU fast path.  Originals are kept as ``A_ell``/``P_ell``/``R_ell``
        for fallback (and for the f64 ``as_dtype`` twin).
        """
        from pyamg_tpu.sparse.matrix import (dia_from_ell,
                                             phase_stencil_from_ell)
        from pyamg_tpu.sparse.sell import sell_from_ell
        from pyamg_tpu.ops.pallas_kernels import pallas_available
        from pyamg_tpu.ops.transpose import transpose
        import dataclasses
        sell = sell and pallas_available()
        for lvl in self.levels:
            if isinstance(lvl.A, ELL):
                D = dia_from_ell(lvl.A, max_diags=max_diags)
                if D is None and sell:
                    D = sell_from_ell(lvl.A)
                if D is not None:
                    lvl.A_ell = lvl.A
                    lvl.A = D
            P = getattr(lvl, "P", None)
            if (isinstance(P, ELL) and P.grid is not None
                    and P.col_grid is not None):
                ps = phase_stencil_from_ell(P, P.grid, P.col_grid)
                if ps is not None:
                    lvl.P_ell = lvl.P
                    lvl.P = ps
                    R = getattr(lvl, "R", None)
                    if isinstance(R, ELL):
                        # R's transpose is fine x coarse = P-oriented;
                        # build once, apply via the adjoint (trans=True)
                        rps = phase_stencil_from_ell(
                            transpose(R), P.grid, P.col_grid)
                        if rps is not None:
                            lvl.R_ell = lvl.R
                            lvl.R = dataclasses.replace(rps, trans=True)
            if sell:
                for attr in ("P", "R"):
                    op = getattr(lvl, attr, None)
                    if isinstance(op, ELL):
                        s = sell_from_ell(op)
                        if s is not None:
                            setattr(lvl, attr + "_ell", op)
                            setattr(lvl, attr, s)
        self._cycle_cache.clear()
        return self

    def collapse_coarse(self, max_n=4096):
        """Truncate the cycle at the first level with ``n <= max_n`` and
        install an exact dense-inverse coarse solve there.

        TPU rationale: each coarse level contributes ~30 small HLO ops to
        the cycle (smoother color sweeps, transfers), all latency-bound —
        a measured ~0.4 ms of the 500² Poisson V-cycle happens below
        n=4096 where the *math* is microseconds.  One dense (MXU) matvec
        with a precomputed inverse replaces the whole tail exactly: a
        V-cycle with a direct coarse solve at level k is a standard
        configuration (reference ``coarse_grid_solver('pinv')``,
        ``multilevel.py:665-826``) and a strictly better preconditioner
        than cycling deeper.

        The inverse is computed on device (f32 LU) — small, one-time.
        Truncated levels are kept in ``self._collapsed_levels`` for
        inspection; complexity metrics reflect the active hierarchy.
        """
        k = next((i for i, l in enumerate(self.levels)
                  if l.A.shape[0] <= max_n), len(self.levels) - 1)
        if k == 0 or k >= len(self.levels) - 1:
            return self       # nothing to collapse / already coarsest
        Ak = self.levels[k].A
        # densify + invert + accuracy probe ON DEVICE in one compiled
        # program: the sparse upload is KBs (vs ~n^2*4 bytes dense) and
        # LU/inv is fast on chip; a singular/semidefinite truncation
        # level (Neumann-type problems, where the reference's
        # coarse_grid_solver('pinv') is specifically robust) makes the
        # LU inverse Inf/NaN or wildly inaccurate — then fall back to an
        # SVD pseudo-inverse.
        from pyamg_tpu.ops.dense import inv_device_checked
        op, err, M = inv_device_checked(Ak)
        if (not bool(jnp.isfinite(err))) or float(err) > 1e-2:
            op = jnp.linalg.pinv(M, rcond=1e-6)
        self._collapsed_levels = self.levels[k:]
        self.levels = self.levels[:k + 1]
        self.levels[k] = Level(Ak)
        cs = CoarseSolver("pinv")
        cs.params = {"op": op}
        self.coarse_solver = cs
        self._cycle_cache.clear()
        return self

    def enable_ds_refinement(self, A_fine64=None):
        """Precompute the double-single (two-f32) form of the f64 fine
        operator for on-device defect correction (see ``ops/ds.py``).

        ``A_fine64``: host ELL/DIA container with f64 values; defaults to
        the stored fine operator's ELL original cast to f64 on host.
        """
        from pyamg_tpu.ops.ds import ds_operator
        if A_fine64 is None:
            A_fine64 = getattr(self.levels[0], "A_ell", self.levels[0].A)
        self._ds_op = ds_operator(A_fine64)
        return self

    def _get_ds_refined_run(self, cycle, tol, inner_tol, inner_maxiter,
                            max_outer):
        """ONE jitted program for the whole mixed-precision solve:
        f64-accuracy outer residuals in double-single arithmetic, f32
        V-cycle-preconditioned CG inner solves, DS accumulation of x —
        zero host round-trips (the TPU-native form of the reference's
        f64 solve loop, ``multilevel.py:544-582``)."""
        key = ("ds_refined", str(cycle).upper(), float(tol),
               float(inner_tol), int(inner_maxiter), int(max_outer),
               self._static_key(),
               self.coarse_solver.kind if not callable(self.coarse_solver.kind)
               else id(self.coarse_solver.kind))
        # static descriptor entries of the DS operator are baked into the
        # traced program; only its arrays ride as jit arguments
        ds_static = {k: v for k, v in self._ds_op.items()
                     if not hasattr(v, "shape")}
        key = key + (tuple(sorted(ds_static.items())),)
        if key not in self._cycle_cache:
            from pyamg_tpu.krylov.methods import cg_loop
            from pyamg_tpu.ops import ds as dsm
            cyc = self._make_cycle(cycle)
            nlev = len(self.levels)

            def run(dyn, ds_arrays, bds):
                # b arrives as ONE stacked (2, n) array — two separate
                # uploads cost an extra ~30 ms fixed tunnel dispatch
                bhi, blo = bds[0], bds[1]
                A_ds = {**ds_static, **ds_arrays}
                A0 = dyn[0][0][0] if nlev > 1 else dyn[1]
                mv = lambda v: matvec(A0, v)
                Mv = lambda r: cyc(dyn, jnp.zeros_like(r), r)
                normb = jnp.linalg.norm(bhi)
                normb = jnp.where(normb == 0, 1.0, normb)
                hist = jnp.zeros((max_outer + 1,), jnp.float32)
                nr0 = jnp.linalg.norm(bhi)
                hist = hist.at[0].set(nr0)
                zeros = jnp.zeros_like(bhi)

                def cond(st):
                    return (~st[-1]) & (st[4] < max_outer)

                def body(st):
                    xhi, xlo, rhi, rlo, k, nr, hist, itot, done = st
                    r32 = rhi / jnp.where(nr == 0, 1, nr)
                    e, info, _, nit = cg_loop(mv, Mv, zeros, r32,
                                              inner_tol, "rr",
                                              inner_maxiter)
                    xhi, xlo = dsm.ds_add_f32(xhi, xlo, nr * e)
                    rhi, rlo = dsm.ds_residual(A_ds, xhi, xlo, bhi, blo)
                    nr = jnp.linalg.norm(rhi)
                    k = k + 1
                    hist = hist.at[k].set(nr)
                    itot = itot + nit - 1
                    return (xhi, xlo, rhi, rlo, k, nr, hist, itot,
                            nr <= tol * normb)

                st = (zeros, zeros, bhi, blo, jnp.int32(0), nr0, hist,
                      jnp.int32(0), nr0 <= tol * normb)
                xhi, xlo, rhi, rlo, k, nr, hist, itot, done = \
                    lax.while_loop(cond, body, st)
                # stacked so the caller fetches x in ONE transfer
                return jnp.stack([xhi, xlo]), hist, k, itot

            self._cycle_cache[key] = jax.jit(run)
        return self._cycle_cache[key]

    def solve_refined_device(self, b, tol=1e-10, inner_tol=1e-5,
                             inner_maxiter=30, max_outer=10, cycle="V",
                             residuals=None, iterations_out=None):
        """Mixed-precision solve to f64 accuracy entirely on device.

        The f64 outer residual of the reference's solve loop is computed
        in double-single f32 arithmetic (no f64 ALU on TPU), the error
        equation is solved by the f32 V-cycle-preconditioned CG, and the
        whole defect-correction iteration runs as one jitted program —
        the device is dispatched once per solve.  Returns x as f64
        (numpy, host).

        ``iterations_out``: optional dict populated with
        ``{'outer': k, 'inner': total_inner_cg_iterations}``.
        """
        if getattr(self, "_ds_op", None) is None:
            self.enable_ds_refinement()
        from pyamg_tpu.ops.ds import ds_from_f64, ds_to_f64
        b64 = np.asarray(b, np.float64).reshape(-1)
        bhi, blo = ds_from_f64(b64)
        run = self._get_ds_refined_run(cycle, tol, inner_tol,
                                       inner_maxiter, max_outer)
        ds_arrays = {k: v for k, v in self._ds_op.items()
                     if hasattr(v, "shape")}
        xs, hist, k, itot = run(self._dyn(), ds_arrays,
                                jnp.asarray(np.stack([bhi, blo])))
        xs = np.asarray(xs)
        x = ds_to_f64(xs[0], xs[1])
        if residuals is not None:
            residuals[:] = [float(v) for v in
                            np.asarray(hist)[:int(k) + 1]]
        if iterations_out is not None:
            iterations_out["outer"] = int(k)
            iterations_out["inner"] = int(itot)
        return x

    def to_device(self, device):
        """Move every level's arrays (operators, smoother params, coarse
        factorization) onto ``device`` and return self.

        The intended production flow is: run the (graph-heavy, latency
        bound) setup phase on host CPU, then ship the hierarchy to the
        TPU where the jitted solve phase runs without host round-trips.
        """
        def put(x):
            return jax.device_put(x, device)

        for lvl in self.levels:
            for attr in ("A", "P", "R"):
                v = getattr(lvl, attr, None)
                if v is not None:
                    setattr(lvl, attr, jax.tree_util.tree_map(put, v))
            for attr in ("pre", "post"):
                kind, sopts, params = getattr(lvl, attr)
                setattr(lvl, attr,
                        (kind, sopts, jax.tree_util.tree_map(put, params)))
            if getattr(lvl, "B", None) is not None:
                lvl.B = put(lvl.B)
        self.coarse_solver.params = jax.tree_util.tree_map(
            put, self.coarse_solver.params)
        if getattr(self, "_ds_op", None) is not None:
            self._ds_op = {k: (put(v) if hasattr(v, "shape") else v)
                           for k, v in self._ds_op.items()}
        self._cycle_cache.clear()
        return self

    def as_dtype(self, dtype):
        """A dtype-cast twin of this hierarchy (shared static structure).

        Used by ``solve_refined`` to escalate inner solves to f64 when the
        f32 hierarchy hits its rounding floor (attainable relative
        residual ~ eps32·cond(A)) on very ill-conditioned problems.  TPU
        f64 is software-emulated — slower per cycle, so it only runs for
        the final refinement outers.
        """
        dtype = jnp.dtype(dtype)
        cplx = {jnp.dtype(jnp.float64): jnp.complex128,
                jnp.dtype(jnp.float32): jnp.complex64}.get(dtype, None)

        def castf(x):
            if hasattr(x, "dtype"):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x.astype(dtype)
                if cplx is not None and \
                        jnp.issubdtype(x.dtype, jnp.complexfloating):
                    return x.astype(cplx)
            return x

        cast = lambda t: jax.tree_util.tree_map(castf, t)
        from pyamg_tpu.sparse.sell import SELL

        def src(l, attr):
            # SELL kernels are f32-only; the dtype twin uses the stored
            # ELL original instead
            v = getattr(l, attr, None)
            if isinstance(v, SELL):
                v = getattr(l, attr + "_ell", v)
            return v

        levels = []
        for l in self.levels:
            l2 = Level(cast(src(l, "A")),
                       cast(src(l, "P")) if getattr(l, "P", None) is not None
                       else None,
                       cast(src(l, "R")) if getattr(l, "R", None) is not None
                       else None)
            l2.pre = (l.pre[0], l.pre[1], cast(l.pre[2]))
            l2.post = (l.post[0], l.post[1], cast(l.post[2]))
            levels.append(l2)
        new = MultilevelSolver.__new__(MultilevelSolver)
        new.levels = levels
        cs = CoarseSolver(self.coarse_solver.kind, self.coarse_solver.opts)
        cs.params = cast(self.coarse_solver.params)
        for attr in ("_cho_lower", "_smoother_static"):
            if hasattr(self.coarse_solver, attr):
                setattr(cs, attr, getattr(self.coarse_solver, attr))
        new.coarse_solver = cs
        new.symmetric_smoothing = self.symmetric_smoothing
        new._cycle_cache = {}
        if hasattr(self, "_fine_n"):
            new._fine_n = self._fine_n
        return new

    def change_solve_matrix(self, A):
        """Swap the fine-grid matrix and rebuild its smoothers
        (reference ``multilevel.py:320-337``)."""
        from pyamg_tpu.relaxation.smoothing import make_smoother
        self.levels[0].A = A
        # rebuild from the stored (kind, sopts) by re-running setup with the
        # same static options
        for attr in ("pre", "post"):
            kind, sopts, _ = getattr(self.levels[0], attr)
            spec = (kind, dict(sopts)) if kind != "none" else None
            try:
                setattr(self.levels[0], attr,
                        make_smoother(self.levels[0], A, spec))
            except Exception:
                pass
        self._cycle_cache.clear()

    def solve_refined(self, b, A_fine=None, tol=1e-10, inner_tol=1e-5,
                      inner_maxiter=30, max_outer=10, cycle="V",
                      accel="cg", residuals=None):
        """Mixed-precision solve to f64 accuracy: f64 defect correction
        wrapped around the (typically f32) device hierarchy.

        TPU f32 CG stalls at ~eps32*sqrt(cond(A)) relative residual; the
        classic fix is iterative refinement: the outer residual
        ``r = b - A x`` is computed in f64 (host scipy — one SpMV per
        outer step), the error equation ``A e = r`` is solved on device in
        f32 to ``inner_tol``, and ``x += e`` accumulates in f64.  Reaches
        the reference's 1e-10 targets with all heavy compute in f32.

        ``A_fine``: the fine operator in f64 (scipy sparse, or ELL; defaults
        to the hierarchy's stored fine matrix converted to f64 on host).
        """
        import scipy.sparse as sp
        if A_fine is None:
            A_fine = getattr(self.levels[0], "A_ell", self.levels[0].A)
        if not sp.issparse(A_fine):
            A_fine = to_scipy(A_fine)
        As = A_fine.astype(np.float64)
        b64 = np.asarray(b, np.float64).reshape(-1)
        n = b64.shape[0]
        x = np.zeros(n, np.float64)
        normb = np.linalg.norm(b64) or 1.0
        hist = []
        inner = self
        dtype_in = self.levels[0].A.dtype
        for _ in range(max_outer):
            r = b64 - As @ x
            nr = np.linalg.norm(r)
            hist.append(float(nr))
            if nr <= tol * normb:
                break
            if len(hist) > 1 and nr > 0.7 * hist[-2]:
                # refinement stagnated: the inner solver is at its f32
                # floor (~eps32·cond(A) relative).  Escalate the inner
                # hierarchy to f64 (software-emulated on TPU — slow, so
                # only for these last outers), else stop.
                if inner is self and jnp.dtype(dtype_in) != jnp.float64:
                    with jax.enable_x64():
                        if getattr(self, "_f64_twin", None) is None:
                            self._f64_twin = self.as_dtype(jnp.float64)
                    inner = self._f64_twin
                    dtype_in = jnp.float64
                else:
                    warnings.warn(
                        "solve_refined: outer refinement stalled at "
                        f"relative residual {nr / normb:.2e}")
                    break
            scale = nr
            if inner is self:
                e = inner.solve(jnp.asarray(r / scale, dtype_in),
                                tol=inner_tol, maxiter=inner_maxiter,
                                cycle=cycle, accel=accel)
            else:
                # f64 tier: trace/execute under scoped x64 so the f32
                # fast path (incl. Pallas kernels) never sees the flag
                with jax.enable_x64():
                    e = inner.solve(jnp.asarray(r / scale, dtype_in),
                                    tol=inner_tol, maxiter=inner_maxiter,
                                    cycle=cycle, accel=accel)
            x = x + scale * np.asarray(e, np.float64)[:n]
        else:
            r = b64 - As @ x
            hist.append(float(np.linalg.norm(r)))
        if residuals is not None:
            residuals[:] = hist
        return x

    def solve(self, b, x0=None, tol=1e-5, maxiter=100, cycle="V",
              accel=None, callback=None, residuals=None, return_info=False,
              cycles_per_level=1):
        """Solve Ax=b by multigrid cycling, optionally Krylov-accelerated
        (reference ``multilevel.py:398``)."""
        A0 = self.levels[0].A
        b = jnp.asarray(b).reshape(-1)
        if b.dtype != A0.dtype:
            b = b.astype(A0.dtype)
        # distributed hierarchies may have padded the fine level
        fine_n = getattr(self, "_fine_n", A0.shape[0])
        npad = A0.shape[0] - b.shape[0]
        if npad > 0:
            b = jnp.concatenate([b, jnp.zeros((npad,), b.dtype)])
        x = jnp.zeros_like(b) if x0 is None else \
            jnp.asarray(x0).reshape(-1).astype(A0.dtype)
        if x.shape[0] < A0.shape[0]:
            x = jnp.concatenate(
                [x, jnp.zeros((A0.shape[0] - x.shape[0],), x.dtype)])

        if accel is not None:
            import pyamg_tpu.krylov as krylov
            if isinstance(accel, str):
                if accel == "cg" and not self.symmetric_smoothing:
                    warnings.warn(
                        "Incompatible non-symmetric multigrid preconditioner "
                        "detected, due to presmoother/postsmoother combination. "
                        "CG requires SPD preconditioner, not just SPD matrix.")
                if accel in ("cg", "gmres", "fgmres") and callback is None:
                    # cached one-jit path: hierarchy rides as arguments, so
                    # repeat solves skip retracing (the generic path builds
                    # a fresh jit per call and bakes dyn in as constants)
                    run = self._get_accel_run(accel, cycle, tol, maxiter)
                    from pyamg_tpu.krylov.common import finalize
                    xf, info, resbuf, nres = run(self._dyn(), x, b)
                    finalize(residuals, resbuf, nres)
                    xf = xf[:fine_n]
                    if return_info:
                        return xf, int(info)
                    return xf
                method = getattr(krylov, accel)
            else:
                method = accel
            M = self.aspreconditioner(cycle)
            x, info = method(A0, b, x0=x, tol=tol, maxiter=maxiter, M=M,
                             callback=callback, residuals=residuals)
            x = x[:fine_n]
            if return_info:
                return x, info
            return x

        dyn = self._dyn()

        if callback is None:
            run = self._get_standalone_run(cycle, cycles_per_level, tol,
                                           maxiter)
            x, it, resbuf = run(dyn, x, b)
            x = x[:fine_n]
            if residuals is not None:
                k = int(it) + 1
                residuals[:] = [float(v) for v in np.asarray(resbuf)[:k]]
            if return_info:
                return x, (0 if int(it) < maxiter else int(it))
            return x

        # host loop with callback
        cyc_j = jax.jit(cyc)
        res_j = jax.jit(lambda dyn, x, b: jnp.linalg.norm(
            b - matvec(dyn[0][0][0] if len(self.levels) > 1 else dyn[1], x)))
        normb = float(jnp.linalg.norm(np.asarray(b))) or 1.0
        if residuals is not None:
            residuals[:] = [float(res_j(dyn, x, b))]
        it = 0
        while True:
            x = cyc_j(dyn, x, b)
            it += 1
            nr = float(res_j(dyn, x, b))
            if residuals is not None:
                residuals.append(nr)
            callback(x)
            if nr < tol * normb:
                info = 0
                break
            if it >= maxiter:
                info = it
                break
        x = x[:fine_n]
        if return_info:
            return x, info
        return x
