"""Distributed (sharded) SA setup phase — build the hierarchy without ever
materializing a global matrix on one host.

The reference has no distributed layer at all (SURVEY.md §0: every setup
kernel is a serial C++ loop, e.g. ``smoothed_aggregation.h:138``), so this
is new TPU-native design.  The classic ghost-zone / "communication
package" idea (hypre, ML/MueLu) rebuilt for shard_map + static shapes:

* the fine operator is 1-D row-block partitioned over mesh axis ``'rows'``
  with *global* column indices; each device builds its own row block
  (``dist_stencil_grid``) — there is never a full (n, W) host array;
* every cross-shard access is a *ghost-margin* exchange: each shard
  ``ppermute``s its first/last ``g`` rows to ring neighbours, giving an
  extended view ``[prev_g | local | next_g]``.  The margin ``g`` is the
  operator's true coupling reach (one scalar reduction per level), so the
  plan is static per level and the traffic is ring-neighbour only;
* aggregation runs on the GLOBAL strength graph: Luby MIS-2 rounds and
  label propagation exchange their per-node vectors through the same
  ghost margins each round, so aggregates cross shard boundaries freely
  (each aggregate is owned by its root's shard).  Nodes with no strong
  neighbours — including the identity rows that pad unused coarse slots —
  stay unaggregated with zero T rows (reference standard_aggregation
  semantics), which is what keeps hierarchy quality flat with depth;
* each shard owns a static block of ``C_cap`` coarse ids (global coarse id
  = shard * C_cap + local aggregate).  Unused slots become identity rows
  of the coarse operator — the static-shape price, accounted for in the
  complexity numbers;
* Galerkin ``R (A P)`` runs the scatter-free device SpGEMM
  (``ops.rowops.dedup_rows``) per shard in column chunks (bounded peak
  memory), with ghost-exchanged P / AP rows; ``R = P^T`` is a per-shard
  transpose of the ghost-extended P restricted to locally-owned coarse
  columns.

Solve phase: ``DistHierarchy.vcycle``/``cg_solve`` run the whole cycle
under one shard_map (per-shard SpMV with margin exchange, ``psum`` dots).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:                                   # older jax
    from jax.experimental.shard_map import shard_map

from pyamg_tpu.ops.rowops import dedup_rows


# --------------------------------------------------------------------------
# per-shard primitives (used inside shard_map bodies)
# --------------------------------------------------------------------------


def _ext_rows(x, g: int, ndev: int):
    """[prev devices' last g rows | x | next devices' first g rows].

    Multi-hop ring exchange: when ``g`` exceeds the shard size (coarse
    levels with sparse global numbering), whole neighbour blocks are
    relayed ``ceil(g / n_loc)`` hops.  Ring edges receive zeros.
    """
    if g == 0 or ndev == 1:
        return jnp.pad(x, [(g, g)] + [(0, 0)] * (x.ndim - 1))
    n_loc = x.shape[0]
    hops = -(-g // n_loc)
    up = [(e, e + 1) for e in range(ndev - 1)]
    down = [(e, e - 1) for e in range(1, ndev)]
    prev_blocks, next_blocks = [], []
    cur_p, cur_n = x, x
    for _ in range(hops):
        cur_p = lax.ppermute(cur_p, "rows", up)      # cur_p[e] = x[e-h]
        cur_n = lax.ppermute(cur_n, "rows", down)    # cur_n[e] = x[e+h]
        prev_blocks.insert(0, cur_p)
        next_blocks.append(cur_n)
    prev = jnp.concatenate(prev_blocks, axis=0)[-g:] if hops else x[:0]
    nxt = jnp.concatenate(next_blocks, axis=0)[:g] if hops else x[:0]
    return jnp.concatenate([prev, x, nxt], axis=0)


def _gather_ext(x_ext, cols_g, base, valid):
    """out[i, k] = x_ext[cols_g[i, k] - base] where valid & in range.

    Unrolled 1-D gathers per slot (2-D indexed gathers defeat XLA's TPU
    row-gather tiling; see ops/spgemm._expand).
    """
    idx = cols_g - base
    ok = valid & (idx >= 0) & (idx < x_ext.shape[0])
    idxc = jnp.clip(idx, 0, x_ext.shape[0] - 1)
    parts = [x_ext[idxc[:, j]] for j in range(idxc.shape[1])]
    out = jnp.stack(parts, axis=1)
    return jnp.where(ok if out.ndim == ok.ndim
                     else ok[(...,) + (None,) * (out.ndim - ok.ndim)],
                     out, 0), ok


def _spmv_shard(vals, cols_g, valid, x_ext, base):
    g, _ = _gather_ext(x_ext, cols_g, base, valid)
    return jnp.sum(jnp.where(valid, vals, 0) * g, axis=1)


def _spmv_shard_overlap(vals, cols_g, valid, x, x_ext, row0, g_margin):
    """Distributed SpMV split into an interior term (reads only the local
    shard of x) plus a ghost term (reads the ring-exchanged margins).

    The split is the comm/compute-overlap enabler: the interior product
    has NO data dependency on the ``ppermute`` that builds ``x_ext``, so
    XLA's latency-hiding scheduler is free to run the collective
    concurrently with the bulk of the local matvec instead of stalling
    every row on the exchange (the classic hypre-style overlap,
    expressed as dataflow rather than explicit comm phases).
    """
    n = x.shape[0]
    loc = cols_g - row0
    is_local = valid & (loc >= 0) & (loc < n)
    gl = x[jnp.clip(loc, 0, n - 1)]
    y_int = jnp.sum(jnp.where(is_local, vals * gl, 0), axis=1)
    ghost = valid & ~is_local
    ge, _ = _gather_ext(x_ext, cols_g, row0 - g_margin, ghost)
    y_gh = jnp.sum(jnp.where(ghost, vals * ge, 0), axis=1)
    return y_int + y_gh


def _truncate_by_mag(cols, vals, okmask, out_width):
    """Keep each row's ``out_width`` largest-|value| entries (operator
    filtering under the static width caps — arbitrary column-order
    truncation was the round-4 quality defect at depth), returned
    column-sorted with a dropped-entry count."""
    n, W = cols.shape
    oki = okmask.astype(jnp.int32)
    if W <= out_width:
        pad = out_width - W
        if pad:
            cols = jnp.pad(cols, ((0, 0), (0, pad)))
            vals = jnp.pad(vals, ((0, 0), (0, pad)))
            okmask = jnp.pad(okmask, ((0, 0), (0, pad)))
        return cols, vals, okmask, jnp.zeros((), jnp.int32)
    negabs = jnp.where(okmask, -jnp.abs(vals),
                       jnp.ones((), vals.dtype))
    _, c2, v2, ok2 = lax.sort((negabs, cols, vals, oki), dimension=1,
                              num_keys=1, is_stable=True)
    dropped = jnp.sum(ok2[:, out_width:])
    c2 = c2[:, :out_width]
    v2 = v2[:, :out_width]
    ok2 = ok2[:, :out_width]
    key = jnp.where(ok2 > 0, c2, jnp.int32(2 ** 31 - 1))
    _, c3, v3, ok3 = lax.sort((key, c2, v2, ok2), dimension=1,
                              num_keys=1, is_stable=True)
    return c3, jnp.where(ok3 > 0, v3, 0), ok3 > 0, dropped


def _spgemm_shard(a_cols, a_vals, a_ok, b_cols_ext, b_vals_ext, b_ok_ext,
                  base, n_cols_out, out_width, chunk=8):
    """Per-shard C = A @ B_ext with global output columns, chunked over A
    slots so peak candidate width stays ~chunk*WB + out_width.  Rows
    wider than ``out_width`` keep their largest-|value| entries; the
    dropped count is returned for diagnostics."""
    n, WA = a_cols.shape
    WB = b_cols_ext.shape[1]
    acc_c = jnp.zeros((n, out_width), jnp.int32)
    acc_v = jnp.zeros((n, out_width), b_vals_ext.dtype)
    acc_ok = jnp.zeros((n, out_width), bool)
    dropped = jnp.zeros((), jnp.int32)
    for j0 in range(0, WA, chunk):
        j1 = min(j0 + chunk, WA)
        parts_c, parts_v, parts_ok = [acc_c], [acc_v], [acc_ok]
        for j in range(j0, j1):
            idx = a_cols[:, j] - base
            ok_j = a_ok[:, j] & (idx >= 0) & (idx < b_cols_ext.shape[0])
            idxc = jnp.clip(idx, 0, b_cols_ext.shape[0] - 1)
            parts_c.append(b_cols_ext[idxc])
            parts_v.append(a_vals[:, j:j + 1] * b_vals_ext[idxc])
            parts_ok.append(ok_j[:, None] & b_ok_ext[idxc])
        cc = jnp.concatenate(parts_c, axis=1)
        vv = jnp.concatenate(parts_v, axis=1)
        ok = jnp.concatenate(parts_ok, axis=1)
        c, v, rn = dedup_rows(cc, vv, ok, n_cols_out)
        k = jnp.arange(c.shape[1], dtype=jnp.int32)[None, :]
        keep = k < rn[:, None]
        acc_c, acc_v, acc_ok, dr = _truncate_by_mag(c, v, keep, out_width)
        # the last chunk's drops are final; intermediate drops can only
        # remove entries that a later chunk would have re-merged, so the
        # running max is the honest diagnostic
        dropped = jnp.maximum(dropped, dr)
    return acc_c, acc_v, acc_ok, dropped


def _transpose_shard(p_cols_ext, p_vals_ext, p_ok_ext, col0, c_cap,
                     out_width):
    """R = P_ext^T restricted to coarse cols [col0, col0+c_cap).

    Output columns are *extended fine row indices* (matching the row
    numbering of any ghost-extended per-shard array).  Sort-based: flatten
    triples, sort by local coarse id, rank within run, scatter.
    """
    ne, WP = p_cols_ext.shape
    c_loc = p_cols_ext - col0
    ok = p_ok_ext & (c_loc >= 0) & (c_loc < c_cap)
    key = jnp.where(ok, c_loc, c_cap).reshape(-1).astype(jnp.int32)
    iext = jnp.broadcast_to(
        jnp.arange(ne, dtype=jnp.int32)[:, None], (ne, WP)).reshape(-1)
    vals = jnp.where(ok, p_vals_ext, 0).reshape(-1)
    # secondary sort key = -|value|: rows past the width cap drop their
    # SMALLEST entries (magnitude filtering), not arbitrary ones
    negabs = jnp.where(ok, -jnp.abs(p_vals_ext),
                       jnp.ones((), p_vals_ext.dtype)).reshape(-1)
    key_s, _, iext_s, vals_s = lax.sort((key, negabs, iext, vals),
                                        dimension=0, num_keys=2,
                                        is_stable=True)
    idx = jnp.arange(key_s.shape[0], dtype=jnp.int32)
    head = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    run_start = lax.cummax(jnp.where(head, idx, 0))
    rank = idx - run_start
    keep = (key_s < c_cap) & (rank < out_width)
    # non-kept entries get an out-of-range target and are dropped — a
    # plain (0, 0) fallback would clobber coarse slot [0, 0]
    rk = jnp.where(keep, rank, out_width)
    kk = jnp.where(keep, key_s, c_cap)
    r_cols = jnp.zeros((c_cap, out_width), jnp.int32)
    r_vals = jnp.zeros((c_cap, out_width), vals.dtype)
    r_ok = jnp.zeros((c_cap, out_width), bool)
    r_cols = r_cols.at[kk, rk].set(iext_s, mode="drop")
    r_vals = r_vals.at[kk, rk].set(vals_s, mode="drop")
    r_ok = r_ok.at[kk, rk].set(keep, mode="drop")
    dropped = jnp.sum((key_s < c_cap) & (rank >= out_width))
    return r_cols, r_vals, r_ok, dropped


_PROP_ROUNDS = 3      # label-propagation rounds; MIS-2 maximality puts
                      # every eligible node within 2 hops of a root, so 3
                      # rounds always label everything (radius bound 3)


def _transfer_margin(g: int, n_loc: int, ndev: int) -> int:
    """Static ghost margin covering transfer-operator reach: root within
    _PROP_ROUNDS hops + 1 smoothing hop, each hop <= g rows."""
    return min((_PROP_ROUNDS + 1) * g, ndev * n_loc)


def _nb_max_global(cols_g, strong, x, row0, g, ndev, fill=-1):
    """max over strong neighbors (cross-shard, via margin exchange) incl.
    self of integer per-node values."""
    x_ext = _ext_rows(x, g, ndev)
    gx, okg = _gather_ext(x_ext, cols_g, row0 - g, strong)
    return jnp.maximum(x, jnp.max(jnp.where(okg, gx, fill), axis=1))


def _mis_global(cols_g, strong, eligible, rows_g, row0, g, ndev,
                dist=2, max_rounds=24, weights=None):
    """Luby distance-``dist`` MIS on the GLOBAL strength graph: per
    round the owner computes its rows' values and ring-exchanges them,
    so the neighbourhood maxima cross shard boundaries exactly (the
    two-phase halo idiom).  ``weights``: optional int32 priority (PMIS
    uses strong-degree-scaled weights); defaults to a deterministic
    global-id hash.  Returns the root mask."""
    if weights is None:
        w0 = ((rows_g.astype(jnp.uint32) * jnp.uint32(2654435761)) >> 1)\
            .astype(jnp.int32)
    else:
        w0 = weights

    def nb_max(x):
        return _nb_max_global(cols_g, strong, x, row0, g, ndev)

    def nb_max_k(x):
        for _ in range(dist):
            x = nb_max(x)
        return x

    def round_(state):
        active, roots, it, done = state
        wa = jnp.where(active, w0, -1)
        mk = nb_max_k(wa)
        new_roots = active & (wa == mk) & (wa >= 0)
        roots2 = roots | new_roots
        rk = nb_max_k(jnp.where(roots2, 1, 0))
        active2 = active & (rk < 1)
        rem = lax.psum(jnp.sum(active2.astype(jnp.int32)), "rows")
        return (active2, roots2, it + 1, rem == 0)

    def cond(state):
        return (~state[3]) & (state[2] < max_rounds)

    rem0 = lax.psum(jnp.sum(eligible.astype(jnp.int32)), "rows")
    st = (eligible, jnp.zeros_like(eligible), jnp.int32(0), rem0 == 0)
    _, roots, _, _ = lax.while_loop(cond, round_, st)
    return roots


def _mis2_global(cols_g, strong, eligible, rows_g, row0, g, ndev,
                 max_rounds=24):
    return _mis_global(cols_g, strong, eligible, rows_g, row0, g, ndev,
                       dist=2, max_rounds=max_rounds)


def _propagate_global(cols_g, strong, w, lab, eligible, row0, g, ndev,
                      rounds=6):
    """Cross-shard label propagation: each round exchanges the label
    vector's margins, then every unlabeled node adopts the label of its
    strongest labeled neighbor (labels are global root row ids)."""
    for _ in range(rounds):
        lab_ext = _ext_rows(lab, g, ndev)
        labs, okg = _gather_ext(lab_ext, cols_g, row0 - g, strong)
        # invalid gather slots fill with 0, which is a real label — mask
        okl = okg & (jnp.where(okg, labs, -1) >= 0)
        score = jnp.where(okl, w, -jnp.inf)
        j = jnp.argmax(score, axis=1)
        best_ok = jnp.take_along_axis(okl, j[:, None], axis=1)[:, 0]
        best = jnp.take_along_axis(labs, j[:, None], axis=1)[:, 0]
        lab = jnp.where((lab < 0) & eligible & best_ok, best, lab)
    return lab


# --------------------------------------------------------------------------
# sharded containers
# --------------------------------------------------------------------------

@dataclasses.dataclass
class DistLevel:
    """One sharded level: (ndev*n_loc, W)-padded arrays, global columns."""
    cols: jax.Array            # (n, W) int32, global columns
    vals: jax.Array            # (n, W)
    ok: jax.Array              # (n, W) bool valid mask
    n_loc: int                 # rows per shard
    g: int                     # ghost margin (rows) of this operator
    Dinv: jax.Array = None     # (n,) inverse diagonal
    # transfer ops (set on all but the coarsest level)
    p_cols: jax.Array = None   # (n, WP) global coarse cols
    p_vals: jax.Array = None
    p_ok: jax.Array = None
    r_cols: jax.Array = None   # (n_coarse, WR) *extended fine* cols
    r_vals: jax.Array = None
    r_ok: jax.Array = None
    omega: float = None        # damped-Jacobi weight (omega/rho folded in)
    cheb: jax.Array = None     # Chebyshev coefficients (descending, on
                               # [rho/30, 1.1 rho]); when set the solve
                               # smoother is the polynomial sweep
    gp: int = 0                # transfer margin: R cols index the
                               # [prev_gp | local | next_gp] extension
    gcp: int = 0               # extra coarse-vector margin for prolong
                               # (cross-shard aggregate ownership reach)

    @property
    def n(self):
        return self.cols.shape[0]

    def nnz(self):
        return int(jnp.sum(self.ok))


@dataclasses.dataclass
class DistHierarchy:
    levels: List[DistLevel]
    mesh: Mesh
    coarse_dense: jax.Array            # replicated dense coarsest operator
    coarse_n: int
    diagnostics: dict

    def operator_complexity(self):
        fine = self.levels[0].nnz()
        return sum(l.nnz() for l in self.levels) / max(fine, 1)

    # ---------------- solve phase ----------------
    def _vcycle_shard(self, levs, x, b, nu=2):
        """Per-shard V(nu,nu) cycle; levs = per-shard pytrees list."""
        mesh_n = int(self.mesh.devices.size)

        def smooth(L, meta, x, b, sweeps):
            cols, vals, ok, Dinv = L["cols"], L["vals"], L["ok"], L["Dinv"]
            g = meta["g"]

            def Amv(v):
                v_ext = _ext_rows(v, g, mesh_n)
                return _spmv_shard_overlap(vals, cols, ok, v, v_ext,
                                           meta["base"], g)

            if L.get("cheb") is not None:
                # Chebyshev polynomial sweep (reference setup_chebyshev,
                # smoothing.py:627): x += p(A)(b - A x), Horner
                co = L["cheb"]
                r = b - Amv(x)
                h = co[0] * r
                for i in range(1, co.shape[0]):
                    h = co[i] * r + Amv(h)
                return x + h
            for _ in range(sweeps):
                r = b - Amv(x)
                x = x + meta["omega"] * Dinv * r
            return x

        def cycle(l, x, b):
            L, meta = levs[l]
            if l == len(levs) - 1:
                # replicated dense coarse solve: all-gather b
                bg = lax.all_gather(b, "rows").reshape(-1)
                xg = self._coarse_op @ bg
                sh = b.shape[0]
                dev = lax.axis_index("rows")
                return lax.dynamic_slice_in_dim(xg, dev * sh, sh)
            x = smooth(L, meta, x, b, nu)
            g = meta["g"]
            x_ext = _ext_rows(x, g, mesh_n)
            r = b - _spmv_shard_overlap(L["vals"], L["cols"], L["ok"], x,
                                        x_ext, meta["base"], g)
            # restrict: R cols index the gp-extended fine row space
            gp = meta["gp"]
            r_ext = _ext_rows(r, gp, mesh_n)
            bc = jnp.sum(jnp.where(L["r_ok"], L["r_vals"], 0) *
                         jnp.stack([r_ext[L["r_cols"][:, j]]
                                    for j in range(L["r_cols"].shape[1])],
                                   axis=1), axis=1)
            xc = cycle(l + 1, jnp.zeros_like(bc), bc)
            # prolong: P cols are global coarse ids of the next level;
            # cross-shard aggregate ownership reaches gcp coarse rows
            Lc, metac = levs[l + 1]
            gc = max(metac["g"], meta["gcp"])
            xc_ext = _ext_rows(xc, gc, mesh_n)
            e = _spmv_shard(L["p_vals"], L["p_cols"], L["p_ok"], xc_ext,
                            metac["base"] - gc)
            x = x + e
            return smooth(L, meta, x, b, nu)

        return cycle(0, x, b)

    def _shard_pytrees(self):
        """Split level arrays into per-shard dicts + static meta (inside
        shard_map the arrays arrive as local blocks; meta carries the
        global base offset as a traced scalar)."""
        out = []
        for l, L in enumerate(self.levels):
            d = {"cols": L.cols, "vals": L.vals, "ok": L.ok,
                 "Dinv": L.Dinv}
            if L.cheb is not None:
                d["cheb"] = L.cheb
            if L.p_cols is not None:
                d.update(p_cols=L.p_cols, p_vals=L.p_vals, p_ok=L.p_ok,
                         r_cols=L.r_cols, r_vals=L.r_vals, r_ok=L.r_ok)
            out.append((d, {"g": L.g, "omega": L.omega, "n_loc": L.n_loc,
                            "gp": L.gp, "gcp": L.gcp}))
        return out

    def solve_cg(self, b, tol=1e-8, maxiter=100, nu=2):
        """Distributed V-cycle-preconditioned CG, one jitted shard_map."""
        mesh = self.mesh
        ndev = int(mesh.devices.size)
        levels = self._shard_pytrees()
        self._coarse_op = self.coarse_dense

        arrays = [d for d, _ in levels]
        metas = [m for _, m in levels]

        def body(b_sh, *arrs):
            dev = lax.axis_index("rows")
            levs = []
            for d0, m in zip(arrs, metas):
                meta = dict(m)
                meta["base"] = dev * m["n_loc"]
                meta["omega"] = m["omega"]
                levs.append((d0, meta))

            def Amv(x):
                L, meta = levs[0]
                x_ext = _ext_rows(x, meta["g"], ndev)
                return _spmv_shard_overlap(L["vals"], L["cols"], L["ok"],
                                           x, x_ext, meta["base"],
                                           meta["g"])

            def Mmv(r):
                return self._vcycle_shard(levs, jnp.zeros_like(r), r, nu=nu)

            def dot(u, v):
                return lax.psum(jnp.vdot(u, v), "rows")

            x = jnp.zeros_like(b_sh)
            r = b_sh
            z = Mmv(r)
            p = z
            rz = dot(r, z)
            bnorm = jnp.sqrt(dot(b_sh, b_sh))

            def cg_round(state):
                x, r, p, rz, it = state
                Ap = Amv(p)
                alpha = rz / dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = Mmv(r)
                rz_new = dot(r, z)
                p = z + (rz_new / rz) * p
                return (x, r, p, rz_new, it + 1)

            def cond(state):
                x, r, p, rz, it = state
                return (jnp.sqrt(dot(r, r)) > tol * bnorm) & (it < maxiter)

            x, r, _, _, it = lax.while_loop(
                cond, cg_round, (x, r, p, rz, jnp.int32(0)))
            return x, jnp.sqrt(dot(r, r)) / bnorm, it

        specs_in = []
        for d in arrays:
            specs_in.append({k: (P() if k == "cheb" else
                                 P("rows", *([None] * (v.ndim - 1))))
                             for k, v in d.items()})
        f = shard_map(body, mesh=mesh,
                      in_specs=(P("rows"),) + tuple(specs_in),
                      out_specs=(P("rows"), P(), P()))
        x, relres, it = jax.jit(f)(b, *arrays)
        return x, float(relres), int(it)

    def solve_fgmres(self, b, tol=1e-8, restart=20, max_outer=10, nu=2):
        """Distributed V-cycle-preconditioned FGMRES (right
        preconditioning), one jitted shard_map — the nonsymmetric solve
        of BASELINE config 5 (advection-diffusion + AMG-GMRES at scale).

        Arnoldi runs CGS2 with ``psum`` dots (each orthogonalization is
        two small replicated matmuls per shard); the (restart+1, restart)
        Hessenberg least-squares solves replicated per shard.  Returns
        ``(x, relres, total_inner_iterations)``.
        """
        mesh = self.mesh
        ndev = int(mesh.devices.size)
        levels = self._shard_pytrees()
        self._coarse_op = self.coarse_dense
        arrays = [d for d, _ in levels]
        metas = [m for _, m in levels]
        R = int(restart)

        def body(b_sh, *arrs):
            dev = lax.axis_index("rows")
            levs = []
            for d0, m in zip(arrs, metas):
                meta = dict(m)
                meta["base"] = dev * m["n_loc"]
                levs.append((d0, meta))

            def Amv(x):
                L, meta = levs[0]
                x_ext = _ext_rows(x, meta["g"], ndev)
                return _spmv_shard_overlap(L["vals"], L["cols"], L["ok"],
                                           x, x_ext, meta["base"],
                                           meta["g"])

            def Mmv(r):
                return self._vcycle_shard(levs, jnp.zeros_like(r), r,
                                          nu=nu)

            def pdot(u, v):
                return lax.psum(jnp.vdot(u, v), "rows")

            n_sh = b_sh.shape[0]
            bnorm = jnp.sqrt(pdot(b_sh, b_sh))
            bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
            dt = b_sh.dtype

            def cycle(x):
                r = b_sh - Amv(x)
                beta = jnp.sqrt(pdot(r, r))
                V = jnp.zeros((R + 1, n_sh), dt)
                # mark the Z carry 'rows'-varying up front (the loop body
                # writes varying rows into it; shard_map's vma checker
                # requires carry types to match)
                Z = lax.pcast(jnp.zeros((R, n_sh), dt), ("rows",),
                              to="varying")
                V = V.at[0].set(r / jnp.where(beta == 0, 1, beta))
                H = jnp.zeros((R + 1, R), dt)

                def arnoldi(j, st):
                    V, Z, H = st
                    zj = Mmv(V[j])
                    Z = Z.at[j].set(zj)
                    w = Amv(zj)
                    mask = (jnp.arange(R + 1) <= j).astype(dt)
                    h1 = lax.psum(V @ w, "rows") * mask
                    w = w - V.T @ h1
                    h2 = lax.psum(V @ w, "rows") * mask
                    w = w - V.T @ h2
                    wn = jnp.sqrt(pdot(w, w))
                    H = H.at[:, j].set(h1 + h2)
                    H = H.at[j + 1, j].set(wn)
                    V = V.at[j + 1].set(
                        w / jnp.where(wn == 0, 1, wn))
                    return (V, Z, H)

                V, Z, H = lax.fori_loop(0, R, arnoldi, (V, Z, H))
                e1 = jnp.zeros((R + 1,), dt).at[0].set(beta)
                # replicated small least squares via normal equations on
                # the (R+1, R) Hessenberg (R is small)
                y = jnp.linalg.solve(
                    H.T @ H + 1e-30 * jnp.eye(R, dtype=dt), H.T @ e1)
                x = x + Z.T @ y
                r = b_sh - Amv(x)
                return x, jnp.sqrt(pdot(r, r))

            def outer(st):
                x, nr, k = st
                x, nr = cycle(x)
                return (x, nr, k + 1)

            def cond(st):
                return (st[1] > tol * bnorm) & (st[2] < max_outer)

            x0 = jnp.zeros_like(b_sh)
            r0 = jnp.sqrt(pdot(b_sh, b_sh))
            x, nr, k = lax.while_loop(cond, outer,
                                      (x0, r0, jnp.int32(0)))
            return x, nr / bnorm, k * R

        specs_in = []
        for d in arrays:
            specs_in.append({k: (P() if k == "cheb" else
                                 P("rows", *([None] * (v.ndim - 1))))
                             for k, v in d.items()})
        f = shard_map(body, mesh=mesh,
                      in_specs=(P("rows"),) + tuple(specs_in),
                      out_specs=(P("rows"), P(), P()))
        x, relres, it = jax.jit(f)(b, *arrays)
        return x, float(relres), int(it)


# --------------------------------------------------------------------------
# sharded gallery: per-shard construction of a stencil-grid operator
# --------------------------------------------------------------------------

def dist_stencil_grid(stencil, grid, mesh: Mesh, dtype=jnp.float32):
    """Row-block-sharded ``stencil_grid`` — each shard builds only its own
    rows (never a global host array).  Returns (cols, vals, ok) sharded
    jax arrays with global columns, plus n_loc.

    Equivalent operator to ``gallery.stencil_grid(stencil, grid)``
    (reference ``pyamg/gallery/stencil.py:8``), Dirichlet truncation.
    """
    stencil = np.asarray(stencil)
    grid = tuple(int(g) for g in grid)
    n = int(np.prod(grid))
    ndev = int(mesh.devices.size)
    n_loc = -(-n // ndev)
    n_pad = n_loc * ndev
    offs_nd = np.argwhere(np.ones(stencil.shape)) - \
        (np.asarray(stencil.shape) // 2)
    svals = stencil.ravel()
    keep = svals != 0
    offs_nd = offs_nd[keep]
    svals = svals[keep]
    strides = np.cumprod((grid[1:] + (1,))[::-1])[::-1]
    W = len(svals)

    shards = []
    sh = NamedSharding(mesh, P("rows", None))
    for d, dev in enumerate(mesh.devices.ravel()):
        r0, r1 = d * n_loc, min((d + 1) * n_loc, n)
        rows = np.arange(r0, max(r1, r0))
        # nd index of each row
        idx = np.empty((len(rows), len(grid)), np.int64)
        rem = rows.copy()
        for axis, s in enumerate(strides):
            idx[:, axis] = rem // s
            rem = rem % s
        cols = np.zeros((n_loc, W), np.int32)
        vals = np.zeros((n_loc, W), jnp.zeros((), dtype).dtype)
        ok = np.zeros((n_loc, W), bool)
        for k, (off, sv) in enumerate(zip(offs_nd, svals)):
            tgt = idx + off[None, :]
            inside = np.all((tgt >= 0) & (tgt < np.asarray(grid)[None, :]),
                            axis=1)
            col = (tgt * strides[None, :]).sum(axis=1)
            m = len(rows)
            cols[:m, k] = np.where(inside, col, 0)
            vals[:m, k] = np.where(inside, sv, 0)
            ok[:m, k] = inside
        # identity-pad rows beyond n (global row id = own index)
        if r1 - r0 < n_loc:
            pad_rows = np.arange(r0 + (r1 - r0), r0 + n_loc)
            cols[r1 - r0:, 0] = pad_rows
            vals[r1 - r0:, 0] = 1
            ok[r1 - r0:, 0] = True
        # sort each row by column (ELL invariant) — W is small
        order = np.argsort(np.where(ok, cols, n_pad), axis=1)
        cols = np.take_along_axis(cols, order, axis=1)
        vals = np.take_along_axis(vals, order, axis=1)
        ok = np.take_along_axis(ok, order, axis=1)
        shards.append((cols, vals, ok))

    def _assemble(i, dt):
        return jax.make_array_from_single_device_arrays(
            (n_pad, W), sh,
            [jax.device_put(np.asarray(s[i], dt), dev)
             for s, dev in zip(shards, mesh.devices.ravel())])

    cols = _assemble(0, np.int32)
    vals = _assemble(1, jnp.zeros((), dtype).dtype)
    ok = _assemble(2, bool)
    return cols, vals, ok, n_loc


def dist_from_scipy(A, mesh: Mesh, dtype=jnp.float32, rcm=True):
    """Row-partition a general (scipy-convertible) square sparse matrix
    into the sharded ``(cols, vals, ok, n_loc)`` format that
    ``distributed_sa_setup`` consumes (SURVEY §7.3 "halo plans for
    general graphs": the halo plan here is the ghost-margin bound, so a
    bandwidth-reducing ordering is what makes general matrices cheap).

    ``rcm=True`` applies reverse-Cuthill-McKee first (reference
    ``pyamg/util``-adjacent ``graph.py:744`` ``symmetric_rcm``): the ring
    margin ``g`` is the matrix bandwidth, so RCM typically shrinks the
    exchanged ghost rows by orders of magnitude on unstructured meshes.

    Returns ``(cols, vals, ok, n_loc, perm)`` — ``perm`` maps original
    row ids to the internal ordering (identity when ``rcm=False``);
    solutions come back in the internal ordering, so apply
    ``x_orig[perm] = x_internal`` ... i.e. ``x_orig = x[inv]`` with
    ``inv = np.argsort(perm)``.
    """
    import scipy.sparse as sp
    from pyamg_tpu.sparse.matrix import to_scipy as _tosp_mat
    if not sp.issparse(A):
        A = _tosp_mat(A)
    A = A.tocsr()
    n, m = A.shape
    if n != m:
        raise ValueError("expected square matrix")
    if rcm:
        from pyamg_tpu.graph import symmetric_rcm
        from pyamg_tpu.sparse.matrix import from_scipy as _fromsp
        perm = np.asarray(symmetric_rcm(_fromsp(A)))
        A = A[perm][:, perm].tocsr()
    else:
        perm = np.arange(n)

    ndev = int(mesh.devices.size)
    n_loc = -(-n // ndev)
    n_pad = n_loc * ndev
    W = int(np.diff(A.indptr).max()) if n else 1
    np_dtype = jnp.zeros((), dtype).dtype

    sh = NamedSharding(mesh, P("rows", None))
    shards = []
    for d in range(ndev):
        r0, r1 = d * n_loc, min((d + 1) * n_loc, n)
        cols = np.zeros((n_loc, W), np.int32)
        vals = np.zeros((n_loc, W), np_dtype)
        ok = np.zeros((n_loc, W), bool)
        for i, row in enumerate(range(r0, r1)):
            lo, hi = A.indptr[row], A.indptr[row + 1]
            k = hi - lo
            cols[i, :k] = A.indices[lo:hi]
            vals[i, :k] = A.data[lo:hi]
            ok[i, :k] = True
        if r1 - r0 < n_loc:          # identity-pad rows beyond n
            pad_rows = np.arange(r0 + (r1 - r0), r0 + n_loc)
            cols[r1 - r0:, 0] = pad_rows
            vals[r1 - r0:, 0] = 1
            ok[r1 - r0:, 0] = True
        shards.append((cols, vals, ok))

    def _assemble(i, dt):
        return jax.make_array_from_single_device_arrays(
            (n_pad, W), sh,
            [jax.device_put(np.asarray(s[i], dt), dev)
             for s, dev in zip(shards, mesh.devices.ravel())])

    return (_assemble(0, np.int32), _assemble(1, np_dtype),
            _assemble(2, bool), n_loc, perm)


# --------------------------------------------------------------------------
# the sharded setup driver
# --------------------------------------------------------------------------

def _margin_of(cols, ok, n_loc, mesh):
    """Smallest ghost margin covering every cross-row coupling (scalar)."""
    def body(cols_b, ok_b):
        dev = lax.axis_index("rows")
        rows = dev * n_loc + jnp.arange(cols_b.shape[0], dtype=jnp.int32)
        d = jnp.where(ok_b, jnp.abs(cols_b - rows[:, None]), 0)
        return lax.pmax(jnp.max(d), "rows")[None]

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("rows", None), P("rows", None)),
                  out_specs=P("rows"), check_vma=False)
    return int(np.max(np.asarray(f(cols, ok))))


def distributed_sa_setup(cols, vals, ok, n_loc, mesh: Mesh,
                         theta=0.0, omega=4.0 / 3.0, max_levels=10,
                         coarsen_until=4096, coarse_ratio=4,
                         wp_cap=12, wr_cap=48, wac_cap=24,
                         rho_iters=12, seed=0,
                         smoother="jacobi", cheb_degree=3):
    """Build an SA hierarchy from a sharded fine operator.

    Args:
      cols/vals/ok: (ndev*n_loc, W) sharded arrays, global columns.
      coarse_ratio: C_cap = n_loc // coarse_ratio coarse slots per shard.
      wp_cap/wr_cap/wac_cap: static width caps for P / R / A_coarse rows
        (dropped-entry counts are reported in diagnostics).

    Returns a DistHierarchy.  Reference semantics: strength =
    ``symmetric_strength_of_connection`` (``smoothed_aggregation.h:56``),
    aggregation = shard-local MIS-2 + propagation (device counterpart of
    ``standard_aggregation``, ``smoothed_aggregation.h:138``), tentative =
    constant-vector ``fit_candidates`` (K=1), prolongation = damped-Jacobi
    smoothing (``smooth.py:61``), Galerkin triple product.
    """
    ndev = int(mesh.devices.size)
    levels: List[DistLevel] = []
    diagnostics = {"dropped": [], "nagg": [], "margins": []}

    lvl_cols, lvl_vals, lvl_ok, lvl_nloc = cols, vals, ok, n_loc
    for lvl_i in range(max_levels):
        n_glob = lvl_cols.shape[0]
        g = _margin_of(lvl_cols, lvl_ok, lvl_nloc, mesh)
        diagnostics["margins"].append(g)
        if n_glob <= coarsen_until or g >= lvl_nloc \
                or lvl_nloc // coarse_ratio < 1:
            break
        c_cap = max(lvl_nloc // coarse_ratio, 1)
        W = lvl_cols.shape[1]

        # spectral radius of D^-1 A via distributed power iteration
        rho = _power_rho(lvl_cols, lvl_vals, lvl_ok, lvl_nloc, g, mesh,
                         iters=rho_iters, seed=seed + lvl_i)

        out = _level_step(lvl_cols, lvl_vals, lvl_ok, lvl_nloc, g, c_cap,
                          mesh, theta, omega / max(rho, 1e-30),
                          wp_cap, wr_cap, wac_cap, seed + lvl_i)
        (p_cols, p_vals, p_ok, r_cols, r_vals, r_ok,
         ac_cols, ac_vals, ac_ok, Dinv, nagg, dropped) = out

        gp = _transfer_margin(g, lvl_nloc, ndev)
        cheb = None
        if smoother == "chebyshev":
            # reference setup_chebyshev (smoothing.py:627): polynomial
            # minimal on [rho(A)/30, 1.1 rho(A)], applied to b - A x
            from pyamg_tpu.relaxation.chebyshev import \
                chebyshev_polynomial_coefficients
            rho_A = _power_rho(lvl_cols, lvl_vals, lvl_ok, lvl_nloc, g,
                               mesh, iters=rho_iters,
                               seed=seed + 37 + lvl_i, use_dinv=False)
            co = -chebyshev_polynomial_coefficients(
                rho_A / 30.0, 1.1 * rho_A, int(cheb_degree))[:-1]
            cheb = jnp.asarray(co, lvl_vals.dtype)
        L = DistLevel(cols=lvl_cols, vals=lvl_vals, ok=lvl_ok,
                      n_loc=lvl_nloc, g=g, Dinv=Dinv,
                      p_cols=p_cols, p_vals=p_vals, p_ok=p_ok,
                      r_cols=r_cols, r_vals=r_vals, r_ok=r_ok,
                      omega=float(omega / max(rho, 1e-30)),
                      gp=gp,
                      gcp=(-(-gp // lvl_nloc)) * c_cap,
                      cheb=cheb)
        levels.append(L)
        diagnostics["nagg"].append(int(np.sum(np.asarray(nagg))))
        diagnostics["dropped"].append(int(np.sum(np.asarray(dropped))))
        lvl_cols, lvl_vals, lvl_ok, lvl_nloc = \
            ac_cols, ac_vals, ac_ok, c_cap

    # coarsest level: replicate + dense factor-free pinv apply
    g = diagnostics["margins"][-1] if len(levels) == 0 else \
        _margin_of(lvl_cols, lvl_ok, lvl_nloc, mesh)
    rho = _power_rho(lvl_cols, lvl_vals, lvl_ok, lvl_nloc, g, mesh,
                     iters=rho_iters, seed=seed + 99)
    Dinv_c = _dinv_sharded(lvl_cols, lvl_vals, lvl_ok, lvl_nloc, mesh)
    Lc = DistLevel(cols=lvl_cols, vals=lvl_vals, ok=lvl_ok,
                   n_loc=lvl_nloc, g=g, Dinv=Dinv_c,
                   omega=float(1.0 / max(rho, 1e-30)))
    levels.append(Lc)

    nc = lvl_cols.shape[0]
    dense = _densify_replicated(lvl_cols, lvl_vals, lvl_ok, nc)
    coarse_pinv = jnp.linalg.pinv(dense)

    return DistHierarchy(levels=levels, mesh=mesh,
                         coarse_dense=coarse_pinv, coarse_n=nc,
                         diagnostics=diagnostics)


def distributed_classical_setup(cols, vals, ok, n_loc, mesh: Mesh,
                                theta=0.25, omega=4.0 / 5.0,
                                max_levels=10, coarsen_until=4096,
                                coarse_ratio=2, wr_cap=48, wac_cap=32,
                                rho_iters=12, seed=0):
    """Distributed classical (Ruge-Stuben-style) AMG setup: classical
    strength -> PMIS C/F splitting (distance-1 global Luby MIS with
    strong-degree weights) -> direct interpolation -> R = P^T ->
    Galerkin, all per-level inside one shard_map.

    Reference semantics per component: classical SOC
    (``ruge_stuben.h:64``), PMIS (``split.py:155`` /
    ``graph.h:140``), direct interpolation weights
    (``ruge_stuben.h:777-895`` pass1/pass2 formula).  The sequential RS
    coarsening itself has no scalable analogue (SURVEY §2.2) — PMIS is
    the parallel splitting the reference itself recommends at scale.
    Returns a :class:`DistHierarchy` (same damped-Jacobi-smoothed solve
    phase as the SA variant).
    """
    ndev = int(mesh.devices.size)
    levels: List[DistLevel] = []
    diagnostics = {"dropped": [], "nagg": [], "margins": []}

    lvl_cols, lvl_vals, lvl_ok, lvl_nloc = cols, vals, ok, n_loc
    for lvl_i in range(max_levels):
        n_glob = lvl_cols.shape[0]
        g = _margin_of(lvl_cols, lvl_ok, lvl_nloc, mesh)
        diagnostics["margins"].append(g)
        if n_glob <= coarsen_until or g >= lvl_nloc \
                or lvl_nloc // coarse_ratio < 1:
            break
        c_cap = max(lvl_nloc // coarse_ratio, 1)

        rho = _power_rho(lvl_cols, lvl_vals, lvl_ok, lvl_nloc, g, mesh,
                         iters=rho_iters, seed=seed + lvl_i)
        out = _classical_level_step(lvl_cols, lvl_vals, lvl_ok, lvl_nloc,
                                    g, c_cap, mesh, float(theta), wr_cap,
                                    wac_cap, seed + lvl_i)
        (p_cols, p_vals, p_ok, r_cols, r_vals, r_ok,
         ac_cols, ac_vals, ac_ok, Dinv, ncp, dropped) = out

        gp = min(2 * g, ndev * lvl_nloc)
        L = DistLevel(cols=lvl_cols, vals=lvl_vals, ok=lvl_ok,
                      n_loc=lvl_nloc, g=g, Dinv=Dinv,
                      p_cols=p_cols, p_vals=p_vals, p_ok=p_ok,
                      r_cols=r_cols, r_vals=r_vals, r_ok=r_ok,
                      omega=float(omega / max(rho, 1e-30)),
                      gp=gp,
                      gcp=(-(-gp // lvl_nloc)) * c_cap)
        levels.append(L)
        diagnostics["nagg"].append(int(np.sum(np.asarray(ncp))))
        diagnostics["dropped"].append(int(np.sum(np.asarray(dropped))))
        lvl_cols, lvl_vals, lvl_ok, lvl_nloc = \
            ac_cols, ac_vals, ac_ok, c_cap

    g = diagnostics["margins"][-1] if len(levels) == 0 else \
        _margin_of(lvl_cols, lvl_ok, lvl_nloc, mesh)
    rho = _power_rho(lvl_cols, lvl_vals, lvl_ok, lvl_nloc, g, mesh,
                     iters=rho_iters, seed=seed + 99)
    Dinv_c = _dinv_sharded(lvl_cols, lvl_vals, lvl_ok, lvl_nloc, mesh)
    levels.append(DistLevel(cols=lvl_cols, vals=lvl_vals, ok=lvl_ok,
                            n_loc=lvl_nloc, g=g, Dinv=Dinv_c,
                            omega=float(1.0 / max(rho, 1e-30))))
    nc = lvl_cols.shape[0]
    dense = _densify_replicated(lvl_cols, lvl_vals, lvl_ok, nc)
    return DistHierarchy(levels=levels, mesh=mesh,
                         coarse_dense=jnp.linalg.pinv(dense),
                         coarse_n=nc, diagnostics=diagnostics)


@partial(jax.jit, static_argnames=("n_loc", "g", "c_cap", "mesh", "theta",
                                   "wr_cap", "wac_cap", "seed"))
def _classical_level_step(cols, vals, ok, n_loc, g, c_cap, mesh, theta,
                          wr_cap, wac_cap, seed):
    """One sharded classical level: classical SOC -> PMIS -> direct
    interpolation -> R = P^T -> Ac."""
    ndev = int(mesh.devices.size)
    gP = min(2 * g, ndev * n_loc)
    W = int(cols.shape[1])
    wp_eff = W                    # P rows: strong C-neighbours (<= W)
    wr_eff = max(wr_cap, 2 * W)
    wac_eff = max(wac_cap, W + 8)

    def body(cols_b, vals_b, ok_b):
        dev = lax.axis_index("rows")
        row0 = dev * n_loc
        n = cols_b.shape[0]
        rows_g = row0 + jnp.arange(n, dtype=jnp.int32)

        hit = ok_b & (cols_b == rows_g[:, None])
        diag = jnp.sum(jnp.where(hit, vals_b, 0), axis=1)
        dinv = jnp.where(diag != 0, 1.0 / diag, 0.0)

        # --- classical strength, 'abs' norm (ruge_stuben.h:64): row-
        # local, no exchange
        offd = ok_b & ~hit
        mag = jnp.abs(vals_b)
        mx = jnp.max(jnp.where(offd, mag, 0), axis=1)
        strong = offd & (mag >= theta * mx[:, None]) & (vals_b != 0)

        # --- PMIS C/F splitting: distance-1 MIS with strong-degree
        # weights (split.py:388 lambda = degree + rand)
        eligible = jnp.any(strong, axis=1)
        deg = jnp.sum(strong.astype(jnp.int32), axis=1)
        hashr = ((rows_g.astype(jnp.uint32) * jnp.uint32(2654435761))
                 >> 17).astype(jnp.int32)      # 15-bit tie-break
        wts = deg * jnp.int32(1 << 15) + hashr
        Cpt = _mis_global(cols_b, strong, eligible, rows_g, row0, g,
                          ndev, dist=1, weights=wts)
        ncp = jnp.sum(Cpt.astype(jnp.int32))
        overflow = jnp.maximum(ncp - c_cap, 0)
        rank = jnp.cumsum(Cpt.astype(jnp.int32)) - 1
        cid = jnp.where(Cpt, dev * c_cap + jnp.minimum(rank, c_cap - 1),
                        jnp.int32(-1))

        # --- direct interpolation (ruge_stuben.h:777-895): weights from
        # A's row restricted to strong C-neighbours; neighbour splitting
        # and coarse ids arrive via one margin exchange
        cid_ext = _ext_rows(cid, g, ndev)
        cj, okj = _gather_ext(cid_ext, cols_b, row0 - g, strong)
        isC = okj & (cj >= 0)                 # strong C-neighbour slots
        a = vals_b
        neg = a < 0
        ssn = jnp.sum(jnp.where(isC & neg, a, 0), axis=1)
        ssp = jnp.sum(jnp.where(isC & ~neg, a, 0), axis=1)
        san = jnp.sum(jnp.where(offd & neg, a, 0), axis=1)
        sap = jnp.sum(jnp.where(offd & ~neg, a, 0), axis=1)
        no_sp = ssp == 0
        no_sn = ssn == 0
        diag_eff = diag + jnp.where(no_sp, sap, 0) \
            + jnp.where(no_sn, san, 0)
        alpha = jnp.where(no_sn, 0, san / jnp.where(no_sn, 1, ssn))
        beta = jnp.where(no_sp, 0, sap / jnp.where(no_sp, 1, ssp))
        dsafe = jnp.where(diag_eff == 0, 1, diag_eff)
        coeff = jnp.where(neg, -alpha[:, None] / dsafe[:, None],
                          -beta[:, None] / dsafe[:, None])
        p_vals = jnp.where(isC, coeff * a, 0)
        # C rows: identity entry at own coarse id
        p_vals = jnp.where(Cpt[:, None],
                           jnp.zeros_like(p_vals), p_vals)
        p_cols = jnp.where(isC, cj, 0)
        p_ok = isC & ~Cpt[:, None]
        own = jnp.where(Cpt, cid, 0)
        p_cols = p_cols.at[:, 0].set(
            jnp.where(Cpt, own, p_cols[:, 0]))
        p_vals = p_vals.at[:, 0].set(
            jnp.where(Cpt, jnp.ones((), vals_b.dtype), p_vals[:, 0]))
        p_ok = p_ok.at[:, 0].set(jnp.where(Cpt, True, p_ok[:, 0]))
        pc, pv, prn = dedup_rows(p_cols, p_vals, p_ok, ndev * c_cap)
        kk = jnp.arange(pc.shape[1], dtype=jnp.int32)[None, :]
        p_okf = kk < prn[:, None]
        p_cols, p_vals, p_ok, dropped_p = _truncate_by_mag(
            pc, pv, p_okf, wp_eff)

        # --- R = P^T, Ac = R (A P): same machinery as the SA step
        p_cols_ext = _ext_rows(p_cols, gP, ndev)
        p_vals_ext = _ext_rows(p_vals, gP, ndev)
        p_ok_ext = _ext_rows(p_ok, gP, ndev)
        ap_c, ap_v, ap_ok, dropped_ap = _spgemm_shard(
            cols_b, vals_b, ok_b, p_cols_ext, p_vals_ext, p_ok_ext,
            row0 - gP, ndev * c_cap, wac_eff)
        r_cols, r_vals, r_ok, dropped_r = _transpose_shard(
            p_cols_ext, p_vals_ext, p_ok_ext, dev * c_cap, c_cap, wr_eff)
        ap_c_ext = _ext_rows(ap_c, gP, ndev)
        ap_v_ext = _ext_rows(ap_v, gP, ndev)
        ap_ok_ext = _ext_rows(ap_ok, gP, ndev)
        ac_c, ac_v, ac_ok, dropped_ac = _spgemm_shard(
            r_cols, r_vals, r_ok, ap_c_ext, ap_v_ext, ap_ok_ext,
            0, ndev * c_cap, wac_eff)
        slot = jnp.arange(c_cap, dtype=jnp.int32)
        used = slot < jnp.minimum(ncp, c_cap)
        own_s = dev * c_cap + slot
        ac_c = jnp.where(used[:, None], ac_c,
                         jnp.concatenate([own_s[:, None],
                                          jnp.zeros((c_cap,
                                                     ac_c.shape[1] - 1),
                                                    jnp.int32)], axis=1))
        ident_v = jnp.concatenate(
            [jnp.ones((c_cap, 1), ac_v.dtype),
             jnp.zeros((c_cap, ac_v.shape[1] - 1), ac_v.dtype)], axis=1)
        ac_v = jnp.where(used[:, None], ac_v, ident_v)
        ident_ok = jnp.concatenate(
            [jnp.ones((c_cap, 1), bool),
             jnp.zeros((c_cap, ac_ok.shape[1] - 1), bool)], axis=1)
        ac_ok = jnp.where(used[:, None], ac_ok, ident_ok)

        dropped = (overflow + dropped_p + dropped_r + dropped_ap +
                   dropped_ac)[None]
        return (p_cols, p_vals, p_ok, r_cols, r_vals, r_ok,
                ac_c, ac_v, ac_ok, dinv, ncp[None],
                dropped.astype(jnp.int32))

    rowspec2 = P("rows", None)
    f = shard_map(body, mesh=mesh,
                  in_specs=(rowspec2, rowspec2, rowspec2),
                  out_specs=(rowspec2, rowspec2, rowspec2,
                             rowspec2, rowspec2, rowspec2,
                             rowspec2, rowspec2, rowspec2,
                             P("rows"), P("rows"), P("rows")))
    return f(cols, vals, ok)


def _dinv_sharded(cols, vals, ok, n_loc, mesh):
    def body(cols_b, vals_b, ok_b):
        dev = lax.axis_index("rows")
        rows = dev * n_loc + jnp.arange(cols_b.shape[0], dtype=jnp.int32)
        hit = ok_b & (cols_b == rows[:, None])
        d = jnp.sum(jnp.where(hit, vals_b, 0), axis=1)
        return jnp.where(d != 0, 1.0 / d, 0.0)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("rows", None),) * 3, out_specs=P("rows"))
    return jax.jit(f)(cols, vals, ok)


def _power_rho(cols, vals, ok, n_loc, g, mesh, iters=8, seed=0,
               use_dinv=True):
    """rho(D^-1 A) (or rho(A) with ``use_dinv=False``) by normalized
    power iteration (distributed)."""
    ndev = int(mesh.devices.size)
    if use_dinv:
        Dinv = _dinv_sharded(cols, vals, ok, n_loc, mesh)
    else:
        Dinv = jnp.ones((cols.shape[0],), vals.dtype)
        from jax.sharding import NamedSharding as _NS
        Dinv = jax.device_put(Dinv, _NS(mesh, P("rows")))

    def body(cols_b, vals_b, ok_b, dinv_b):
        dev = lax.axis_index("rows")
        base = dev * n_loc - g
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(jax.random.fold_in(key, dev),
                              (cols_b.shape[0],), vals_b.dtype)

        def it(i, carry):
            x, lam = carry
            x_ext = _ext_rows(x, g, ndev)
            y = dinv_b * _spmv_shard(vals_b, cols_b, ok_b, x_ext, base)
            nrm = jnp.sqrt(lax.psum(jnp.vdot(y, y), "rows"))
            lam = nrm / jnp.maximum(
                jnp.sqrt(lax.psum(jnp.vdot(x, x), "rows")), 1e-30)
            return y / jnp.maximum(nrm, 1e-30), lam

        _, lam = lax.fori_loop(0, iters, it,
                               (x / jnp.sqrt(
                                   lax.psum(jnp.vdot(x, x), "rows")),
                                jnp.ones((), vals_b.dtype)))
        return lam[None]

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("rows", None), P("rows", None),
                            P("rows", None), P("rows")),
                  out_specs=P("rows"), check_vma=False)
    lam = np.asarray(jax.jit(f)(cols, vals, ok, Dinv))
    return float(np.max(lam))


@partial(jax.jit, static_argnames=("n_loc", "g", "c_cap", "mesh", "theta",
                                   "wp_cap", "wr_cap", "wac_cap", "seed"))
def _level_step(cols, vals, ok, n_loc, g, c_cap, mesh, theta, omega_eff,
                wp_cap, wr_cap, wac_cap, seed):
    """One sharded SA level: strength -> cross-shard aggregation -> T ->
    P -> AP -> R -> Ac, all inside a single shard_map."""
    ndev = int(mesh.devices.size)
    # transfer margin: a node's aggregate root sits <= _PROP_ROUNDS
    # strength-graph hops away (each hop spans <= g rows), plus one hop
    # of prolongation smoothing
    gP = _transfer_margin(g, n_loc, ndev)
    # effective static width caps: coarse-level operators are denser, so
    # P rows legitimately reach W+1 entries and Ac rows grow with the
    # squared stencil — scale the caps with the incoming width instead
    # of truncating real entries (magnitude filtering still guards the
    # tail, counted in `dropped`)
    W_in = int(cols.shape[1])
    wp_eff = max(wp_cap, W_in + 1)
    wr_eff = max(wr_cap, 2 * wp_eff)
    wac_eff = max(wac_cap, W_in + 8)

    def body(cols_b, vals_b, ok_b):
        dev = lax.axis_index("rows")
        row0 = dev * n_loc
        n = cols_b.shape[0]
        rows_g = row0 + jnp.arange(n, dtype=jnp.int32)

        # diag + Dinv
        hit = ok_b & (cols_b == rows_g[:, None])
        diag = jnp.sum(jnp.where(hit, vals_b, 0), axis=1)
        dinv = jnp.where(diag != 0, 1.0 / diag, 0.0)

        # --- strength (symmetric SOC, smoothed_aggregation.h:56)
        diag_ext = _ext_rows(diag, g, ndev)
        dj, okd = _gather_ext(diag_ext, cols_b, row0 - g, ok_b)
        thr = theta * jnp.sqrt(jnp.abs(diag)[:, None] * jnp.abs(dj))
        strong = ok_b & okd & (jnp.abs(vals_b) >= thr)
        offdiag = cols_b != rows_g[:, None]
        strong = strong & offdiag

        # --- cross-shard aggregation on the GLOBAL strength graph.
        # Nodes with no strong neighbor (isolated rows, and the identity
        # rows padding unused coarse slots of the previous level) stay
        # unaggregated with a zero T row — the reference's
        # standard_aggregation semantics (smoothed_aggregation.h:177).
        # Without this, identity rows become singleton aggregates and
        # compound per level until real aggregates alias into clamped
        # slots (the round-4 depth-degradation defect).
        eligible = jnp.any(strong, axis=1)
        roots = _mis2_global(cols_b, strong, eligible, rows_g, row0, g,
                             ndev)
        lab = jnp.where(roots, rows_g, jnp.int32(-1))
        w = jnp.where(strong, jnp.abs(vals_b), 0)
        lab = _propagate_global(cols_b, strong, w, lab, eligible, row0, g,
                                ndev, rounds=_PROP_ROUNDS)
        # eligible stragglers (label never arrived) seal as singletons
        strag = eligible & (lab < 0)
        roots = roots | strag
        lab = jnp.where(strag, rows_g, lab)
        rank = jnp.cumsum(roots.astype(jnp.int32)) - 1
        nagg = jnp.sum(roots.astype(jnp.int32))
        overflow_agg = jnp.maximum(nagg - c_cap, 0)
        croot = jnp.where(roots,
                          dev * c_cap + jnp.minimum(rank, c_cap - 1),
                          jnp.int32(-1))

        # --- tentative prolongator: coarse id of each node's root,
        # fetched through a wider margin (roots sit <= propagation-round
        # hops away, each hop spanning <= g rows).  Unit T columns: the
        # V-cycle is invariant to per-column scaling of T (Galerkin +
        # diagonally-scaled smoothers are scaling-equivariant), so the
        # reference's 1/sqrt(aggregate size) normalization
        # (fit_candidates) is not exchanged for.
        croot_ext = _ext_rows(croot, gP, ndev)
        ridx = lab - (row0 - gP)
        ok_r = (lab >= 0) & (ridx >= 0) & (ridx < croot_ext.shape[0])
        cid = jnp.where(
            ok_r, croot_ext[jnp.clip(ridx, 0, croot_ext.shape[0] - 1)],
            jnp.int32(-1))
        t_ok = cid >= 0
        t_cols = jnp.where(t_ok, cid, 0)
        t_vals = jnp.where(t_ok, jnp.ones((), vals_b.dtype), 0)

        # --- P = (I - omega_eff D^-1 A) T  (width <= W+1, dedup'd)
        t_cols_ext = _ext_rows(t_cols, g, ndev)
        t_vals_ext = _ext_rows(t_vals, g, ndev)
        t_ok_ext = _ext_rows(t_ok, g, ndev)
        # candidate from -omega D^-1 A T
        tj_c, okj = _gather_ext(t_cols_ext, cols_b, row0 - g, ok_b)
        tj_v, _ = _gather_ext(t_vals_ext, cols_b, row0 - g, ok_b)
        tj_ok, _ = _gather_ext(t_ok_ext, cols_b, row0 - g, ok_b)
        cand_c = jnp.concatenate([t_cols[:, None], tj_c], axis=1)
        cand_v = jnp.concatenate(
            [t_vals[:, None],
             -omega_eff * dinv[:, None] * vals_b * tj_v], axis=1)
        cand_ok = jnp.concatenate(
            [t_ok[:, None], ok_b & okj & tj_ok], axis=1)
        pc, pv, prn = dedup_rows(cand_c, cand_v, cand_ok, ndev * c_cap)
        kk = jnp.arange(pc.shape[1], dtype=jnp.int32)[None, :]
        p_ok_full = kk < prn[:, None]
        p_cols, p_vals, p_ok, dropped_p = _truncate_by_mag(
            pc, pv, p_ok_full, wp_eff)

        # --- AP = A @ P_ext   (global coarse cols).  P is extended by
        # gP (not g): cross-shard aggregates mean P entries contributing
        # to a remote shard's coarse block sit up to gP rows away, and
        # the transpose/Galerkin below read that same extension.
        p_cols_ext = _ext_rows(p_cols, gP, ndev)
        p_vals_ext = _ext_rows(p_vals, gP, ndev)
        p_ok_ext = _ext_rows(p_ok, gP, ndev)
        ap_c, ap_v, ap_ok, dropped_ap = _spgemm_shard(
            cols_b, vals_b, ok_b, p_cols_ext, p_vals_ext, p_ok_ext,
            row0 - gP, ndev * c_cap, wac_eff)

        # --- R = P_ext^T restricted to local coarse block
        r_cols, r_vals, r_ok, dropped_r = _transpose_shard(
            p_cols_ext, p_vals_ext, p_ok_ext, dev * c_cap, c_cap, wr_eff)

        # --- Ac = R @ AP_ext  (R cols are extended-fine indices).
        # R cols index rows of the gP-extended P; extending AP by the
        # same gP aligns extended row i of P_ext with extended row i of
        # ap_*_ext, so the product uses base 0.
        ap_c_ext = _ext_rows(ap_c, gP, ndev)
        ap_v_ext = _ext_rows(ap_v, gP, ndev)
        ap_ok_ext = _ext_rows(ap_ok, gP, ndev)
        ac_c, ac_v, ac_ok, dropped_ac = _spgemm_shard(
            r_cols, r_vals, r_ok, ap_c_ext, ap_v_ext, ap_ok_ext,
            0, ndev * c_cap, wac_eff)
        # identity rows for unused coarse slots keep smoothers defined
        slot = jnp.arange(c_cap, dtype=jnp.int32)
        used = slot < jnp.minimum(nagg, c_cap)
        own = dev * c_cap + slot
        ac_c = jnp.where(used[:, None], ac_c,
                         jnp.concatenate([own[:, None],
                                          jnp.zeros((c_cap,
                                                     ac_c.shape[1] - 1),
                                                    jnp.int32)], axis=1))
        ident_v = jnp.concatenate(
            [jnp.ones((c_cap, 1), ac_v.dtype),
             jnp.zeros((c_cap, ac_v.shape[1] - 1), ac_v.dtype)], axis=1)
        ac_v = jnp.where(used[:, None], ac_v, ident_v)
        ident_ok = jnp.concatenate(
            [jnp.ones((c_cap, 1), bool),
             jnp.zeros((c_cap, ac_ok.shape[1] - 1), bool)], axis=1)
        ac_ok = jnp.where(used[:, None], ac_ok, ident_ok)

        dropped = (overflow_agg + dropped_p + dropped_r + dropped_ap +
                   dropped_ac)[None]
        return (p_cols, p_vals, p_ok, r_cols, r_vals, r_ok,
                ac_c, ac_v, ac_ok, dinv, nagg[None],
                dropped.astype(jnp.int32))

    rowspec2 = P("rows", None)
    f = shard_map(body, mesh=mesh,
                  in_specs=(rowspec2, rowspec2, rowspec2),
                  out_specs=(rowspec2, rowspec2, rowspec2,
                             rowspec2, rowspec2, rowspec2,
                             rowspec2, rowspec2, rowspec2,
                             P("rows"), P("rows"), P("rows")))
    return f(cols, vals, ok)


def _densify_replicated(cols, vals, ok, n):
    """Small coarsest operator -> replicated dense (n, n)."""
    def one_hot_row(c_row, v_row, ok_row):
        oh = (c_row[:, None] ==
              jnp.arange(n, dtype=jnp.int32)[None, :])
        return jnp.sum(jnp.where(ok_row[:, None] & oh, v_row[:, None], 0),
                       axis=0)

    dense = jax.vmap(one_hot_row)(cols, vals, ok)
    return jax.device_put(np.asarray(dense))
