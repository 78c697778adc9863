"""SELL — shift-ELL, the TPU-native layout for *mildly unstructured* sparse
operators (AMG coarse levels, smoothed transfer operators).

Replaces the scipy CSR SpMV hot path of the reference solve phase
(``/root/reference/pyamg/multilevel.py:584-662``) for operators that are
neither pure-banded (``DIA``) nor grid-phase-structured (``PhaseStencil``).

Design
------
TPU Mosaic exposes exactly one vectorized gather: ``take_along_axis`` along
the 128-lane axis with operand/index/output of identical 2D shape (per
sublane, pick any of its 128 lanes).  Arbitrary SpMV gathers therefore get
decomposed at *setup time* into a static plan of lane-gathers:

* Rows live in a padded ``(Sy, 128)`` layout (row ``i`` at sublane ``i//128``,
  lane ``i%128``); ``x`` lives in ``(x_rows, 128)``.
* Every stored entry ``A[i, c]`` is measured against a *generalized diagonal
  anchor*: the x-row a locality-preserving numbering puts near row ``i``
  (``anchor(sigma) = sigma // t`` for tall operators with integer row/col
  ratio ``t``; ``sigma * t`` for fat ones; ``sigma`` for square).  AMG
  operators built from meshes have entries clustered around a handful of
  such quasi-diagonals (measured: 3D SA level-1 inflates only ~3.5x).
* Entries are bucketed into **passes**: each pass has a static window base
  ``w`` and holds at most one entry per output element; the entry's target
  is encoded as ``delta in [0, 128*K)`` relative to ``128*(anchor + w)``.
  A pass then computes, fully vectorized,

      contrib[s, j] = x2[anchor(s) + w + delta//128][delta % 128]

  as ``K`` lane-gathers from ``K`` shifted operand views plus a select,
  and accumulates ``vals * contrib`` — a handful of VPU ops per pass, all
  inside ONE Pallas kernel for the whole SpMV (measured ~1.2us per 262k-slot
  pass on v5e vs ~11ms for the XLA gather formulation it replaces).

The same plan drives the fused hybrid Gauss-Seidel sweep kernel
(``ops/sell_kernels.sell_gs``): sequential 1024-row tiles with the current
``x`` resident in VMEM — Gauss-Seidel across tiles, Jacobi within a tile
(the reference's sequential C++ sweep, ``relaxation.h:49``, re-designed as
a one-kernel TPU op; equivalence is asserted at the convergence-factor
level like the reference's own smoother tests).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


LANE = 128
TILE_SUBLANES = 8          # sublane granularity for padding / GS tiles


@partial(jax.tree_util.register_dataclass,
         data_fields=("vals", "delta", "diag"),
         meta_fields=("bases", "shape", "t", "kind", "K", "pad_top",
                      "x_rows", "_nnz", "base_lo", "base_hi"))
@dataclasses.dataclass(frozen=True)
class SELL:
    """Shift-ELL operator: a static pass plan of windowed lane-gathers."""

    vals: jax.Array      # (T, Sy, 128) value per (pass, output element)
    delta: jax.Array     # (T, Sy, 128) int32 local index in [0, 128*K)
    bases: Tuple[int, ...]  # static window base row per pass (kernels bake
                            # these in: dynamic sublane offsets force Mosaic
                            # relayouts)
    diag: jax.Array      # (n,) main diagonal (square; else size 0)
    shape: Tuple[int, int]
    t: int               # integer row/col ratio
    kind: str            # "tall" (n = t*m) or "fat" (m = t*n); square = tall/1
    K: int               # windows per pass (delta spans K*128)
    pad_top: int         # guard rows above x in the padded x2 layout
    x_rows: int          # total rows of the padded x2 operand
    _nnz: int = 0
    base_lo: int = 0     # min window base (static; drives the tiled kernel)
    base_hi: int = 0     # max window base

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def n_passes(self) -> int:
        return self.vals.shape[0]

    @property
    def Sy(self) -> int:
        return self.vals.shape[1]

    @property
    def Sx(self) -> int:
        return (self.Sy // self.t) if self.kind == "tall" else \
            self.Sy * self.t

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nnz(self) -> int:
        return self._nnz

    @property
    def blocksize(self) -> Tuple[int, int]:
        return (1, 1)

    def mv(self, x):
        from pyamg_tpu.ops.sell_kernels import sell_spmv
        return sell_spmv(self, x)

    def __matmul__(self, x):
        return self.mv(x)

    def diagonal(self):
        return self.diag

    def astype(self, dtype):
        return dataclasses.replace(self, vals=self.vals.astype(dtype),
                                   diag=self.diag.astype(dtype))

    def __repr__(self):
        return (f"SELL(shape={self.shape}, passes={self.n_passes}, "
                f"K={self.K}, "
                f"kind={self.kind}/{self.t}, dtype={self.vals.dtype})")


def _roundup(a, b):
    return -(-a // b) * b


def sell_from_ell(A, max_passes=None, max_elems=2_500_000,
                  max_elems_square=40_000_000,
                  max_inflation=16.0, k_choices=(4, 8, 16)):
    """Build a SELL plan from a host-backed ELL; None if unsuitable.

    Host-side, setup phase.  Unsuitable means: non-f32, too large for the
    kernels (square operators stream x in row-tile windows via explicit
    DMA, so they scale to ~``max_elems_square``; rectangular ones keep x
    VMEM-resident and cap at ``max_elems``), or offset structure too
    scattered (inflation or pass count beyond bounds) — callers fall back
    to the jnp gather path.
    """
    from pyamg_tpu.sparse.matrix import ELL
    if not isinstance(A, ELL):
        return None
    n, m = A.shape
    if n == 0 or m == 0:
        return None
    if np.dtype(A.vals.dtype) != np.float32:
        return None
    cap = max_elems_square if n == m else max_elems
    if max(n, m) > cap:
        return None

    # The whole plan build works slot-wise in the (n, W) ELL layout with
    # int32 arithmetic — O(nnz) streaming passes, no per-entry argsort
    # (the compressed-key formulation cost ~36 s at n=10M; this is ~8 s).
    cols2 = np.asarray(A.cols)
    vals2 = np.asarray(A.vals)
    W = int(cols2.shape[1])
    row_nnz = np.asarray(A.row_nnz)
    valid2 = np.arange(W, dtype=np.int32)[None, :] < row_nnz[:, None]
    nnz = int(row_nnz.sum())
    if nnz == 0:
        return None

    # --- integer-ratio padding -------------------------------------------
    if n >= m:
        kind = "tall"
        t = max(1, int(round(n / m)))
        Sx = _roundup(max(m, -(-n // t)), LANE) // LANE
        # Sy = t*Sx must be a multiple of TILE_SUBLANES
        g = np.gcd(t, TILE_SUBLANES)
        Sx = _roundup(Sx, TILE_SUBLANES // g)
        if t == 1 and Sx >= 512:
            # large squares run the tiled windowed-DMA kernel, whose row
            # tiles want to divide Sy evenly at a useful size
            Sx = _roundup(Sx, 512)
        Sy = t * Sx
    else:
        kind = "fat"
        t = max(1, int(round(m / n)))
        Sy = _roundup(max(n, -(-m // t)), LANE) // LANE
        Sy = _roundup(Sy, TILE_SUBLANES)
        Sx = t * Sy

    rows32 = np.arange(n, dtype=np.int32)
    if kind == "tall":
        anchor_r = (rows32 >> 7) // t if t > 1 else (rows32 >> 7)
    else:
        anchor_r = (rows32 >> 7) * np.int32(t)

    # NOTE on dtypes: every O(nnz) array here is int32 on purpose — this
    # host's int64 vector ops run ~60x slower than int32 (measured), and
    # weighted bincount is another order of magnitude off.
    delta_abs2 = cols2.astype(np.int32, copy=False) - \
        (anchor_r[:, None] << 7)                       # (n, W)
    w2 = delta_abs2 >> 7                 # window row (arith shift = floor)
    wv = w2[valid2]
    wmin = int(wv.min())
    wmax = int(wv.max())
    if wmax - wmin <= 4_000_000:
        uw = np.flatnonzero(np.bincount(wv - wmin)) + wmin
    else:
        uw = np.unique(wv)
    del wv
    # invalid slots (cols=0 padding) may fall outside the valid window
    # range; clip so the group lookup below stays in bounds (they are
    # routed to a sentinel group and masked out of the final scatter)
    w2 = np.clip(w2, wmin, wmax)
    if max_passes is None:
        # a pass costs O(Sy*128) work: allow many passes on short tiles
        max_passes = max(512, 4_000_000 // (Sy * LANE))

    # slot-wise depth is O(W^2 * n); beyond that budget fall back to the
    # sorted-key cumcount (wide ELL only occurs on small coarse levels)
    slotwise = W * W * n <= 2_000_000_000

    # --- choose K and cluster windows into passes -------------------------
    best = None
    for K in k_choices:
        bases_list = []
        start = uw[0]
        for u in uw:
            if u - start >= K:
                bases_list.append(start)
                start = u
        bases_list.append(int(start))
        bases_arr = np.asarray(bases_list, np.int64)
        G = len(bases_arr)
        lut = (np.searchsorted(bases_arr, np.arange(wmin, wmax + 1),
                               side="right") - 1).astype(np.int32)
        # invalid slots -> sentinel group G (keeps every per-slot op
        # unmasked; sentinel rows are dropped from the occupancy counts
        # below and masked out of the scatter)
        gidx2 = np.where(valid2, lut[w2 - wmin], np.int32(G))  # (n, W)
        # depth = per-(row, group) cumcount in slot order (same ordering
        # as the reference's row-major CSR entry order); sentinel slots
        # never collide with a real group
        depth2 = np.zeros((n, W), np.int32)
        if slotwise:
            for k in range(1, W):
                eq = gidx2[:, :k] == gidx2[:, k:k + 1]
                depth2[:, k] = eq.sum(axis=1, dtype=np.int32)
        else:
            ii, kk = np.nonzero(valid2)
            key = gidx2[ii, kk].astype(np.int64) * n + ii
            order = np.argsort(key, kind="stable")
            ks = key[order]
            head = np.concatenate([[True], ks[1:] != ks[:-1]])
            run_id = np.cumsum(head) - 1
            run_start = np.nonzero(head)[0]
            d = np.arange(len(ks)) - run_start[run_id]
            dsc = np.empty(len(ks), np.int64)
            dsc[order] = d
            depth2[ii, kk] = dsc
        # pass widths per group: gw[g] = 1 + deepest occupied slot
        # (one unweighted int32 bincount over (group, depth) codes)
        code = gidx2 * np.int32(W) + depth2
        cnts = np.bincount(code.ravel(), minlength=(G + 1) * W)
        occ = cnts[:G * W].reshape(G, W) > 0
        anyocc = occ.any(axis=1)
        gw = np.where(anyocc, W - np.argmax(occ[:, ::-1], axis=1), 0)
        T = int(gw.sum())
        cost = T * (8 + K)                    # bytes-ish per output element
        if T <= max_passes and (best is None or cost < best[0]):
            best = (cost, K, bases_arr, gidx2, depth2, gw, T)
    if best is None:
        return None
    _, K, bases_arr, gidx2, depth2, gw, T = best
    G = len(bases_arr)
    slots = T * Sy * LANE
    if slots > max_inflation * nnz and slots > 262144:
        return None                 # padded slot volume way beyond nnz

    # --- fill pass arrays --------------------------------------------------
    goff = np.concatenate([[0], np.cumsum(gw)]).astype(np.int32)
    bases32 = np.append(bases_arr.astype(np.int32), 0)  # sentinel slot
    p2 = goff[gidx2] + depth2                  # (n, W) pass index
    dloc2 = delta_abs2 - (bases32[gidx2] << 7)
    vals_t = np.zeros((T, Sy * LANE), np.float32)
    delta_t = np.zeros((T, Sy * LANE), np.int32)
    for k in range(W):
        mk = valid2[:, k]
        pk = p2[:, k]
        # dominant-pass fast path: on structured operators nearly every
        # row of a slot lands in the same pass (boundary rows differ) —
        # one boolean row-assignment plus a tiny scatter for the rest
        pc = int(pk[n // 2])
        cm = mk & (pk == pc)
        if pc < T:
            vals_t[pc, :n][cm] = vals2[cm, k]
            delta_t[pc, :n][cm] = dloc2[cm, k]
            rest = mk & ~cm
        else:
            rest = mk
        if rest.any():
            ri = rows32[rest]
            vals_t[pk[rest], ri] = vals2[rest, k]
            delta_t[pk[rest], ri] = dloc2[rest, k]
    pass_base = np.repeat(bases_arr.astype(np.int32), gw)

    # --- guard extents (in operand rows: tall x is pre-expanded by t) -------
    min_b = int(pass_base.min())
    max_b = int(pass_base.max())
    if kind == "tall":
        pad_top = _roundup(max(0, -t * min_b), TILE_SUBLANES)
        # + TILE_SUBLANES slack: the tiled (windowed-DMA) kernel's
        # scratch window is rounded up to sublane granularity
        x_rows = _roundup(pad_top + t * max(0, max_b + K - 1) + Sy,
                          TILE_SUBLANES) + TILE_SUBLANES
    else:
        pad_top = _roundup(max(0, -min_b), TILE_SUBLANES)
        x_rows = _roundup(pad_top + max(0, max_b + K - 1) + Sx,
                          TILE_SUBLANES) + TILE_SUBLANES

    # --- kernel feasibility: x beyond the VMEM-resident budget needs the
    # tiled windowed-DMA kernel, which exists only for square (tall/t=1)
    # operators and only when a row tile covering the coupling span fits
    # VMEM.  Reject here so callers fall back to the jnp gather path at
    # setup, instead of sell_spmv compiling a pathological kernel at
    # solve time.
    from pyamg_tpu.ops.sell_kernels import (_VMEM_X_BUDGET,
                                            _pick_tile_rows)
    if x_rows * LANE * 4 > _VMEM_X_BUDGET:
        if not (kind == "tall" and t == 1):
            return None
        span = max_b - min_b + K - 1
        if _pick_tile_rows(T, K, span, Sy) is None:
            return None

    if kind == "tall" and t == 1:
        dg = np.zeros((n,), np.float32)
        for k in range(W):
            hit = valid2[:, k] & (cols2[:, k] == rows32)
            dg += np.where(hit, vals2[:, k], 0).astype(np.float32)
    else:
        dg = np.zeros((0,), np.float32)

    return SELL(vals=vals_t.reshape(T, Sy, LANE),
                delta=delta_t.reshape(T, Sy, LANE),
                bases=tuple(int(b) for b in pass_base),
                diag=dg,
                shape=(int(n), int(m)),
                t=int(t), kind=kind, K=int(K),
                pad_top=int(pad_top), x_rows=int(x_rows),
                _nnz=nnz,
                base_lo=int(min_b), base_hi=int(max_b))


def sell_to_scipy(A: SELL):
    """Reconstruct a scipy CSR from the plan (gold-test helper)."""
    import scipy.sparse as sp
    T, Sy, _ = np.asarray(A.vals).shape
    vals = np.asarray(A.vals).reshape(T, Sy * LANE)
    delta = np.asarray(A.delta).reshape(T, Sy * LANE)
    bases = np.asarray(A.bases)
    n, m = A.shape
    rows_all, cols_all, vv_all = [], [], []
    i = np.arange(Sy * LANE, dtype=np.int64)
    sigma = i // LANE
    if A.kind == "tall":
        anchor = sigma // A.t
    else:
        anchor = sigma * A.t
    for p in range(T):
        nz = vals[p] != 0
        c = LANE * (anchor + bases[p]) + delta[p]
        rows_all.append(i[nz])
        cols_all.append(c[nz])
        vv_all.append(vals[p][nz])
    rows = np.concatenate(rows_all)
    colsv = np.concatenate(cols_all)
    vv = np.concatenate(vv_all)
    keep = (rows < n) & (colsv >= 0) & (colsv < m)
    return sp.csr_matrix((vv[keep], (rows[keep], colsv[keep])),
                         shape=(n, m))
