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
            Ad = jnp.asarray(to_scipy(A).toarray())
            self.params = {"op": jnp.linalg.pinv(Ad)}
        elif kind in ("lu", "splu"):
            Ad = jnp.asarray(to_scipy(A).toarray())
            lu, piv = jax.scipy.linalg.lu_factor(Ad)
            self.params = {"lu": lu, "piv": piv}
        elif kind == "cholesky":
            Ad = jnp.asarray(to_scipy(A).toarray())
            c, lower = jax.scipy.linalg.cho_factor(Ad)
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
        """Approximate work per cycle in units of fine-grid nnz
        (reference ``multilevel.py:211``)."""
        cycle = str(cycle).upper()
        nnz = [l.A.nnz for l in self.levels]

        def visits(lvl):
            if cycle == "V":
                return 1
            if cycle == "W":
                return 2 ** lvl
            if cycle == "F":
                return lvl + 1
            if cycle == "AMLI":
                return 2 ** lvl
            raise TypeError(f"unrecognized cycle type {cycle!r}")

        # rough model: smoothing+residual ~ 3 SpMV-equivalents per visit
        total = sum(3.0 * nnz[i] * visits(i) for i in range(len(nnz) - 1))
        total += nnz[-1] * visits(len(nnz) - 1)
        return total / nnz[0]

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

    def _get_cycle(self, cycle, cycles_per_level=1):
        key = (str(cycle).upper(), cycles_per_level, self._static_key(),
               self.coarse_solver.kind if not callable(self.coarse_solver.kind)
               else id(self.coarse_solver.kind))
        if key not in self._cycle_cache:
            self._cycle_cache[key] = self._make_cycle(cycle, cycles_per_level)
        return self._cycle_cache[key]

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

    def compress_stencils(self, max_diags=64):
        """Convert each level's square ELL operator to the banded DIA
        layout when its offset structure is narrow (true for stencil
        problems and their Galerkin coarsenings).  DIA SpMV is gather-free
        — the TPU fast path.  P/R stay in ELL (rectangular)."""
        from pyamg_tpu.sparse.matrix import dia_from_ell
        for lvl in self.levels:
            if isinstance(lvl.A, ELL):
                D = dia_from_ell(lvl.A, max_diags=max_diags)
                if D is not None:
                    lvl.A_ell = lvl.A
                    lvl.A = D
        self._cycle_cache.clear()
        return self

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
        self._cycle_cache.clear()
        return self

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

        cyc = self._get_cycle(cycle, cycles_per_level)
        dyn = self._dyn()

        if callback is None:
            @jax.jit
            def run(dyn, x, b):
                normb = jnp.sqrt(jnp.real(jnp.vdot(b, b)))
                rtol = tol * jnp.where(normb == 0, 1.0, normb)
                r0 = b - matvec(A0, x)
                nr0 = jnp.sqrt(jnp.real(jnp.vdot(r0, r0)))
                resbuf = jnp.zeros((maxiter + 1,), jnp.float64)
                resbuf = resbuf.at[0].set(nr0.astype(jnp.float64))

                def cond(st):
                    x, it, resbuf, done = st
                    return (~done) & (it < maxiter)

                def body(st):
                    x, it, resbuf, done = st
                    x = cyc(dyn, x, b)
                    r = b - matvec(A0, x)
                    nr = jnp.sqrt(jnp.real(jnp.vdot(r, r)))
                    it = it + 1
                    resbuf = resbuf.at[it].set(nr.astype(jnp.float64))
                    return x, it, resbuf, nr < rtol

                x, it, resbuf, done = lax.while_loop(
                    cond, body, (x, jnp.int32(0), resbuf, nr0 < rtol))
                return x, it, resbuf

            x, it, resbuf = run(dyn, x, b)
            x = x[:fine_n]
            if residuals is not None:
                k = int(it) + 1
                residuals[:] = [float(v) for v in np.asarray(resbuf)[:k]]
            if return_info:
                return x, (0 if int(it) < maxiter else int(it))
            return x

        # host loop with callback
        normb = float(jnp.linalg.norm(b)) or 1.0
        if residuals is not None:
            residuals[:] = [float(jnp.linalg.norm(b - matvec(A0, x)))]
        it = 0
        while True:
            x = cyc(dyn, x, b)
            it += 1
            nr = float(jnp.linalg.norm(b - matvec(A0, x)))
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
