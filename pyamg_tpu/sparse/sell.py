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

    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals)
    valid = np.arange(A.width)[None, :] < np.asarray(A.row_nnz)[:, None]
    ii, kk = np.nonzero(valid)
    if len(ii) == 0:
        return None
    cc = cols[ii, kk].astype(np.int64)
    vv = vals[ii, kk]

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
        anchor = (ii // LANE) // t
    else:
        kind = "fat"
        t = max(1, int(round(m / n)))
        Sy = _roundup(max(n, -(-m // t)), LANE) // LANE
        Sy = _roundup(Sy, TILE_SUBLANES)
        Sx = t * Sy
        anchor = (ii // LANE) * t

    delta_abs = cc - LANE * anchor
    w = delta_abs // LANE                      # window row (can be < 0)
    if max_passes is None:
        # a pass costs O(Sy*128) work: allow many passes on short tiles
        max_passes = max(512, 4_000_000 // (Sy * LANE))

    # --- choose K and cluster windows into passes -------------------------
    uw = np.unique(w)
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
        gidx = np.searchsorted(bases_arr, w, side="right") - 1
        # slot depth per (row, group)
        key = gidx.astype(np.int64) * n + ii
        order = np.argsort(key, kind="stable")
        ks = key[order]
        head = np.concatenate([[True], ks[1:] != ks[:-1]])
        run_id = np.cumsum(head) - 1
        run_start = np.nonzero(head)[0]
        depth_sorted = np.arange(len(ks)) - run_start[run_id]
        depth = np.empty(len(ks), np.int64)
        depth[order] = depth_sorted
        # pass widths per group
        G = len(bases_arr)
        gw = np.zeros(G, np.int64)
        np.maximum.at(gw, gidx, depth + 1)
        T = int(gw.sum())
        cost = T * (8 + K)                    # bytes-ish per output element
        if T <= max_passes and (best is None or cost < best[0]):
            best = (cost, K, bases_arr, gidx, depth, gw, T)
    if best is None:
        return None
    _, K, bases_arr, gidx, depth, gw, T = best
    slots = T * Sy * LANE
    if slots > max_inflation * len(ii) and slots > 262144:
        return None                 # padded slot volume way beyond nnz

    # --- fill pass arrays --------------------------------------------------
    goff = np.concatenate([[0], np.cumsum(gw)])
    p = goff[gidx] + depth                     # pass index per entry
    vals_t = np.zeros((T, Sy * LANE), np.float32)
    delta_t = np.zeros((T, Sy * LANE), np.int32)
    vals_t[p, ii] = vv
    delta_t[p, ii] = (delta_abs - LANE * bases_arr[gidx]).astype(np.int32)
    pass_base = np.repeat(bases_arr, gw).astype(np.int32)

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

    if kind == "tall" and t == 1:
        dg = np.zeros((n,), np.float32)
        mask = (cc == ii)
        np.add.at(dg, ii[mask], vv[mask])
    else:
        dg = np.zeros((0,), np.float32)

    return SELL(vals=vals_t.reshape(T, Sy, LANE),
                delta=delta_t.reshape(T, Sy, LANE),
                bases=tuple(int(b) for b in pass_base),
                diag=dg,
                shape=(int(n), int(m)),
                t=int(t), kind=kind, K=int(K),
                pad_top=int(pad_top), x_rows=int(x_rows),
                _nnz=int(len(ii)),
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
