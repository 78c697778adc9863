"""Sparse matrix containers for TPU-native AMG.

Design (TPU-first, not a port):

The reference (pyamg) stores matrices as scipy CSR/BSR and hands raw
``(indptr, indices, data)`` triplets to sequential C++ loops
(``/root/reference/pyamg/amg_core/*.h``).  XLA wants *static shapes* and
*vectorizable access*, so the canonical device format here is a padded
row-major ELL layout:

  * ``cols``    -- ``(n_rows, W) int32``; entry ``cols[i, k]`` is the column of
                   the k-th stored entry of row i.  Entries are sorted by
                   column within each row.  Padding slots hold column 0.
  * ``vals``    -- ``(n_rows, W) dtype``; padding slots hold 0 so that
                   ``vals * x[cols]`` is correct without masking.
  * ``row_nnz`` -- ``(n_rows,) int32``; number of *stored* entries per row
                   (stored entries may include explicit zeros -- needed for
                   sparsity-pattern arguments like the energy-minimization
                   masks, cf. reference ``smoothed_aggregation.h:970``).

``W`` (the pad width) is static, so every op on an ELL is jit-traceable with
fixed shapes.  AMG operators have bounded row degree (operator complexity is
kept near 1.1-1.9), so ELL padding waste is small.

A thin BSR analogue (``BELL``) stores ``(n_block_rows, W, bs, bs)`` blocks for
elasticity-type problems (reference uses scipy BSR).

Host interop goes through scipy (``from_scipy`` / ``to_scipy``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def is_concrete(*arrays) -> bool:
    """True when no argument is a JAX tracer AND no trace is active
    (i.e. genuine host/setup context).

    Setup-phase ops use this to run numpy twins: on small-CPU hosts every
    distinct eager XLA dispatch pays a ~1s tiny-kernel compile, so the
    latency-bound setup graph algorithms must stay in numpy; only the
    jitted solve phase touches XLA.

    The trace-state check matters: inside a jit trace, device arrays that
    arrive as *closure constants* are not Tracer instances, but any jnp op
    on them yields a tracer — so the numpy twin would blow up on the first
    ``np.asarray``.  Treat "being traced" as non-concrete.
    """
    from jax.core import Tracer
    if any(isinstance(a, Tracer) for a in arrays):
        return False
    return trace_state_clean()


def trace_state_clean() -> bool:
    """True when no jit/vmap/etc trace is currently active."""
    try:
        from jax._src.core import trace_state_clean as _tsc
        return _tsc()
    except ImportError:  # pragma: no cover - future jax refactor
        return True


def _np_backed(*arrays) -> bool:
    return all(isinstance(a, np.ndarray) for a in arrays)


def setup_device():
    """Context manager pinning jitted *setup* helpers (graph coloring/MIS
    rounds) to the host CPU backend.

    The setup phase is latency-bound host work; running its small jitted
    fixed-point rounds on an accelerator behind a tunnel costs ~10ms per
    dispatch.  Solve-phase code never runs under this context.
    """
    import contextlib
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def on_setup_device(fn):
    """Decorator: run a setup-phase factory under ``setup_device()``."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with setup_device():
            return fn(*args, **kwargs)
    return wrapper


def _ell_fields():
    return dict(data_fields=("cols", "vals", "row_nnz"),
                meta_fields=("shape", "grid", "col_grid"))


@partial(jax.tree_util.register_dataclass, **_ell_fields())
@dataclasses.dataclass(frozen=True)
class ELL:
    """Padded-row sparse matrix (device-native CSR analogue).

    ``grid`` / ``col_grid`` are optional tensor-grid shapes for the row /
    column index spaces (C-order).  When set (gallery stencil operators and
    grid-structured transfer operators propagate them) they unlock the
    gather-free structured fast paths (``DIA``, ``PhaseStencil``).
    """

    cols: jax.Array      # (n, W) int32
    vals: jax.Array      # (n, W)
    row_nnz: jax.Array   # (n,) int32
    shape: Tuple[int, int]
    grid: Tuple[int, ...] = None
    col_grid: Tuple[int, ...] = None

    # ---- static properties -------------------------------------------------
    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def width(self) -> int:
        return self.cols.shape[1] if self.cols.ndim == 2 else 0

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nnz(self) -> int:
        """Number of stored entries (includes explicit zeros)."""
        return int(np.sum(np.asarray(self.row_nnz)))

    @property
    def blocksize(self) -> Tuple[int, int]:
        return (1, 1)

    def valid_mask(self) -> jax.Array:
        """(n, W) bool: True for stored entries, False for padding."""
        if isinstance(self.row_nnz, np.ndarray):     # host/setup path
            return np.arange(self.width)[None, :] < self.row_nnz[:, None]
        k = jnp.arange(self.width, dtype=jnp.int32)[None, :]
        return k < self.row_nnz[:, None]

    # ---- convenience wrappers (implemented in ops, bound lazily) -----------
    def __matmul__(self, other):
        from pyamg_tpu.ops import matmul
        return matmul(self, other)

    def mv(self, x):
        from pyamg_tpu.ops.spmv import spmv
        return spmv(self, x)

    @property
    def T(self):
        from pyamg_tpu.ops.transpose import transpose
        return transpose(self)

    @property
    def H(self):
        from pyamg_tpu.ops.transpose import transpose
        return transpose(self, conjugate=True)

    def diagonal(self):
        from pyamg_tpu.ops.spmv import extract_diagonal
        return extract_diagonal(self)

    def astype(self, dtype):
        return dataclasses.replace(self, vals=self.vals.astype(dtype))

    def __repr__(self):
        return (f"ELL(shape={self.shape}, width={self.width}, "
                f"dtype={self.vals.dtype})")


@partial(jax.tree_util.register_dataclass,
         data_fields=("cols", "vals", "row_nnz"),
         meta_fields=("shape", "blocksize"))
@dataclasses.dataclass(frozen=True)
class BELL:
    """Padded-row *block* sparse matrix (device-native BSR analogue).

    ``cols[i, k]`` is the block-column of the k-th stored block of block-row
    i; ``vals[i, k]`` is the dense ``(br, bc)`` block.  ``shape`` is the
    *scalar* shape; block grid is ``(shape[0]//br, shape[1]//bc)``.
    """

    cols: jax.Array      # (nb, W) int32
    vals: jax.Array      # (nb, W, br, bc)
    row_nnz: jax.Array   # (nb,) int32
    shape: Tuple[int, int]
    blocksize: Tuple[int, int]

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def n_block_rows(self) -> int:
        return self.shape[0] // self.blocksize[0]

    @property
    def n_block_cols(self) -> int:
        return self.shape[1] // self.blocksize[1]

    @property
    def width(self) -> int:
        return self.cols.shape[1] if self.cols.ndim == 2 else 0

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nnz(self) -> int:
        br, bc = self.blocksize
        return int(np.sum(np.asarray(self.row_nnz))) * br * bc

    def valid_mask(self) -> jax.Array:
        if isinstance(self.row_nnz, np.ndarray):     # host/setup path
            return np.arange(self.width)[None, :] < self.row_nnz[:, None]
        k = jnp.arange(self.width, dtype=jnp.int32)[None, :]
        return k < self.row_nnz[:, None]

    def __matmul__(self, other):
        from pyamg_tpu.ops import matmul
        return matmul(self, other)

    def mv(self, x):
        from pyamg_tpu.ops.spmv import bspmv
        return bspmv(self, x)

    @property
    def T(self):
        from pyamg_tpu.ops.transpose import btranspose
        return btranspose(self)

    @property
    def H(self):
        from pyamg_tpu.ops.transpose import btranspose
        return btranspose(self, conjugate=True)

    def astype(self, dtype):
        return BELL(self.cols, self.vals.astype(dtype), self.row_nnz,
                    self.shape, self.blocksize)

    def __repr__(self):
        return (f"BELL(shape={self.shape}, blocksize={self.blocksize}, "
                f"width={self.width}, dtype={self.vals.dtype})")


@partial(jax.tree_util.register_dataclass,
         data_fields=("data",), meta_fields=("offsets", "shape"))
@dataclasses.dataclass(frozen=True)
class DIA:
    """Banded (diagonal) sparse matrix — the TPU fast path for stencils.

    ``data[d, i] = A[i, i + offsets[d]]`` (0 outside the band/bounds).
    SpMV becomes a sum of shifted elementwise products — no gathers, pure
    streaming, which is what the VPU/HBM pipeline wants.  Offsets are
    static so every op specializes at trace time.

    ``data`` is row-padded to a multiple of the Pallas tile
    (``ops.pallas_kernels.DIA_TILE``) with zeros so the fused single-pass
    TPU kernel needs no per-call data movement; ``shape`` keeps the
    logical size.
    """

    data: jax.Array            # (ndiag, n)
    offsets: Tuple[int, ...]   # static, sorted
    shape: Tuple[int, int]

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def blocksize(self) -> Tuple[int, int]:
        return (1, 1)

    @property
    def nnz(self) -> int:
        return int(np.count_nonzero(np.asarray(self.data)))

    def mv(self, x):
        from pyamg_tpu.ops.spmv import dia_spmv
        return dia_spmv(self, x)

    def __matmul__(self, x):
        from pyamg_tpu.ops.spmv import dia_spmv
        return dia_spmv(self, x)

    def diagonal(self):
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)][:self.shape[0]]
        if isinstance(self.data, np.ndarray):
            return np.zeros((self.shape[0],), self.data.dtype)
        return jnp.zeros((self.shape[0],), self.data.dtype)

    def astype(self, dtype):
        return DIA(self.data.astype(dtype), self.offsets, self.shape)

    def __repr__(self):
        return (f"DIA(shape={self.shape}, ndiags={len(self.offsets)}, "
                f"dtype={self.data.dtype})")


def dia_from_ell(A: ELL, max_diags: int = 64):
    """Convert a square ELL to DIA if its offset structure is narrow
    enough; returns None otherwise (host-side, setup phase)."""
    if A.shape[0] != A.shape[1]:
        return None
    n = A.shape[0]
    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals)
    valid = np.arange(A.width, dtype=np.int32)[None, :] < \
        np.asarray(A.row_nnz)[:, None]
    live = valid & (vals != 0)
    offs = cols.astype(np.int32, copy=False) - \
        np.arange(n, dtype=np.int32)[:, None]
    if not live.any():
        return None
    omin = int(offs[live].min())
    omax = int(offs[live].max())
    if omax - omin <= 4_000_000:
        hist = np.bincount((offs - omin).ravel()[live.ravel()])
        uniq = np.flatnonzero(hist) + omin
    else:
        uniq = np.unique(offs[live])
    if len(uniq) == 0 or len(uniq) > max_diags:
        return None
    # vectorized offset -> diagonal-slot lookup (a python dict loop over
    # every nnz cost 0.5 s at 512^2)
    lutarr = np.full(omax - omin + 1, -1, np.int32)
    lutarr[uniq - omin] = np.arange(len(uniq), dtype=np.int32)
    from pyamg_tpu.ops.pallas_kernels import DIA_TILE
    npad = -(-n // DIA_TILE) * DIA_TILE   # row-pad for the fused kernel
    data = np.zeros((len(uniq), npad), vals.dtype)
    d2 = lutarr[np.clip(offs - omin, 0, omax - omin)]
    rows2 = np.broadcast_to(np.arange(n, dtype=np.int64)[:, None],
                            offs.shape)
    data[d2[live], rows2[live]] = vals[live]
    return DIA(data, tuple(int(o) for o in uniq), (n, n))


def ell_from_dia(A: DIA) -> ELL:
    """DIA back to ELL (host-side)."""
    import scipy.sparse as sp
    n = A.shape[0]
    data = np.asarray(A.data)[:, :n]
    M = sp.dia_matrix((np.stack([np.roll(data[d], off)
                                 for d, off in enumerate(A.offsets)]),
                       np.asarray(A.offsets)), shape=A.shape).tocsr()
    M.eliminate_zeros()
    return from_scipy(M)


@partial(jax.tree_util.register_dataclass,
         data_fields=("arrays",),
         meta_fields=("offsets", "row_grid", "col_grid", "ratio", "trans",
                      "_nnz"))
@dataclasses.dataclass(frozen=True)
class PhaseStencil:
    """Grid-structured transfer operator (prolongation/restriction) —
    the gather-free TPU fast path for P and R.

    When coarsening is grid-aligned (``grid_aggregation``), every fine
    node ``i`` with grid coords ``x`` belongs to coarse cell ``q = x // r``
    with phase ``p = x % r``, and the columns of row ``i`` sit at cells
    ``q + off`` for a tiny static offset set.  Then

        (P x)[cell q, phase p] = sum_k arrays[p][k, q] * X[q + off[p][k]]

    i.e. SpMV becomes per-phase sums of *shifted elementwise products* on
    the coarse grid — pure VPU streaming, no gathers (same principle as
    ``DIA`` but for rectangular grid-ratio operators).  The adjoint
    (restriction) is the mirrored scatter of the same arrays, so ``R=P^T``
    shares storage via ``trans=True``.

    Replaces the reference's CSR ``P @ x`` / ``P.T @ r`` transfer products
    (``pyamg/multilevel.py:614,660``) on stencil hierarchies.
    """

    arrays: Tuple[jax.Array, ...]       # per phase: (n_off_p, *col_grid)
    offsets: Tuple[Tuple[Tuple[int, ...], ...], ...]  # per phase: offsets
    row_grid: Tuple[int, ...]
    col_grid: Tuple[int, ...]
    ratio: Tuple[int, ...]
    trans: bool = False
    _nnz: int = 0

    # -- static properties ---------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        nf = int(np.prod(self.row_grid))
        nc = int(np.prod(self.col_grid))
        return (nc, nf) if self.trans else (nf, nc)

    @property
    def dtype(self):
        return self.arrays[0].dtype

    @property
    def nnz(self) -> int:
        return self._nnz

    @property
    def blocksize(self) -> Tuple[int, int]:
        return (1, 1)

    @property
    def T(self):
        return dataclasses.replace(self, trans=not self.trans)

    @property
    def H(self):
        if jnp.iscomplexobj(self.arrays[0]):
            arrays = tuple(jnp.conj(a) for a in self.arrays)
            return dataclasses.replace(self, arrays=arrays,
                                       trans=not self.trans)
        return self.T

    def astype(self, dtype):
        return dataclasses.replace(
            self, arrays=tuple(a.astype(dtype) for a in self.arrays))

    def __repr__(self):
        return (f"PhaseStencil(row_grid={self.row_grid}, "
                f"col_grid={self.col_grid}, ratio={self.ratio}, "
                f"trans={self.trans}, dtype={self.dtype})")

    # -- padding extents (static) --------------------------------------------
    def _extents(self):
        nd = len(self.col_grid)
        lo = [0] * nd
        hi = [0] * nd
        for offs in self.offsets:
            for off in offs:
                for d in range(nd):
                    lo[d] = max(lo[d], -off[d])
                    hi[d] = max(hi[d], off[d])
        return tuple(lo), tuple(hi)

    # -- apply ---------------------------------------------------------------
    def mv(self, x: jax.Array) -> jax.Array:
        if x.ndim == 2:
            return jax.vmap(self.mv, in_axes=1, out_axes=1)(x)
        return self._rmv(x) if self.trans else self._fmv(x)

    def __matmul__(self, x):
        return self.mv(x)

    def _by_offset(self):
        """{offset: [(phase, slot)]} — terms grouped by shift so each
        distinct offset costs ONE padded-slice op (the per-term slices
        were the latency bottleneck: ~4 us per tiny HLO op on v5e)."""
        groups = {}
        for p in range(len(self.arrays)):
            for k, off in enumerate(self.offsets[p]):
                groups.setdefault(tuple(off), []).append((p, k))
        return groups

    def _fmv(self, x: jax.Array) -> jax.Array:
        """y = P @ x (fine output)."""
        cg, rg, r = self.col_grid, self.row_grid, self.ratio
        nd = len(cg)
        lo, hi = self._extents()
        X = jnp.pad(x.reshape(cg), list(zip(lo, hi)))
        # one slice per distinct offset; the per-(phase, slot) products
        # are elementwise and fuse into a single kernel under XLA
        shifted = {}
        for off in self._by_offset():
            sl = tuple(slice(lo[d] + off[d], lo[d] + off[d] + cg[d])
                       for d in range(nd))
            shifted[off] = X[sl]
        phases = []
        for p in range(len(self.arrays)):
            arr = self.arrays[p]                       # (n_off, *cg)
            acc = None
            for k, off in enumerate(self.offsets[p]):
                term = arr[k] * shifted[tuple(off)]
                acc = term if acc is None else acc + term
            if acc is None:
                acc = jnp.zeros(cg, x.dtype)
            phases.append(acc)
        Y = jnp.stack(phases).reshape(tuple(r) + tuple(cg))
        # (r0..rk, c0..ck) -> (c0, r0, c1, r1, ...)
        axes = []
        for d in range(nd):
            axes += [nd + d, d]
        Y = jnp.transpose(Y, axes)
        Y = Y.reshape(tuple(cg[d] * r[d] for d in range(nd)))
        Y = Y[tuple(slice(0, rg[d]) for d in range(nd))]
        return Y.reshape(-1)

    def _rmv(self, y: jax.Array) -> jax.Array:
        """x = P.T @ y (coarse output).

        Scatter-free adjoint: out[s] = sum over terms of
        (arr[p][k] * Yp[p]) read at the MIRRORED shift ``s - off`` —
        shifted reads of padded products instead of ``.at[].add``
        scatter accumulations (which serialize on TPU).  Terms sharing
        an offset share one slice; products/sums fuse."""
        from jax import lax
        cg, rg, r = self.col_grid, self.row_grid, self.ratio
        nd = len(cg)
        lo, hi = self._extents()
        pad_fine = [(0, cg[d] * r[d] - rg[d]) for d in range(nd)]
        Y = jnp.pad(y.reshape(rg), pad_fine)
        # phase extraction by STRIDED slices — the interleaved-minor-dim
        # transpose this replaces forced a slow relayout (~70 us of a
        # ~115 us apply on the 500^2 level)
        lim = [cg[d] * r[d] for d in range(nd)]
        phase_cache = {}

        def phase(pidx):
            if pidx not in phase_cache:
                starts = np.unravel_index(pidx, r)
                phase_cache[pidx] = lax.slice(Y, starts, lim, r)
            return phase_cache[pidx]

        M = tuple(max(lo[d], hi[d]) for d in range(nd))
        out = None
        for off, terms in self._by_offset().items():
            prod = None
            for (p, k) in terms:
                t = self.arrays[p][k] * phase(p)
                prod = t if prod is None else prod + t
            Ppad = jnp.pad(prod, [(M[d], M[d]) for d in range(nd)])
            sl = tuple(slice(M[d] - off[d], M[d] - off[d] + cg[d])
                       for d in range(nd))
            t = Ppad[sl]
            out = t if out is None else out + t
        if out is None:
            out = jnp.zeros(cg, y.dtype)
        return out.reshape(-1)


def phase_stencil_from_ell(P: ELL, row_grid, col_grid, max_offsets=48,
                           max_reach=4):
    """Convert a grid-structured transfer operator to ``PhaseStencil``.

    Returns None when the operator isn't phase-structured (offsets too
    many/far).  Host-side, setup phase.
    """
    row_grid = tuple(int(g) for g in row_grid)
    col_grid = tuple(int(g) for g in col_grid)
    nd = len(row_grid)
    if len(col_grid) != nd:
        return None
    nf = int(np.prod(row_grid))
    nc = int(np.prod(col_grid))
    if P.shape != (nf, nc):
        return None
    ratio = tuple(-(-row_grid[d] // col_grid[d]) for d in range(nd))
    if any(r < 1 for r in ratio):
        return None

    cols = np.asarray(P.cols)
    vals = np.asarray(P.vals)
    valid = np.arange(P.width)[None, :] < np.asarray(P.row_nnz)[:, None]
    valid = valid & (vals != 0)

    rows_i, slot_k = np.nonzero(valid)
    if len(rows_i) == 0:
        return None
    fcoord = np.stack(np.unravel_index(rows_i, row_grid), axis=1)  # (m, nd)
    ccoord = np.stack(np.unravel_index(cols[rows_i, slot_k], col_grid),
                      axis=1)
    rat = np.array(ratio)
    cell = fcoord // rat
    if np.any(cell >= np.array(col_grid)):
        return None
    phase = fcoord % rat
    off = ccoord - cell                                 # (m, nd)
    if np.abs(off).max() > max_reach:
        return None
    pidx = np.ravel_multi_index(phase.T, ratio)
    cellidx = np.ravel_multi_index(cell.T, col_grid)
    v = vals[rows_i, slot_k]

    nphase = int(np.prod(ratio))
    arrays, offsets = [], []
    total_offs = 0
    for p in range(nphase):
        m = pidx == p
        if not m.any():
            arrays.append(np.zeros((0,) + col_grid, vals.dtype))
            offsets.append(())
            continue
        offs_p = off[m]
        uniq, inv = np.unique(offs_p, axis=0, return_inverse=True)
        total_offs += len(uniq)
        if total_offs > max_offsets:
            return None
        arr = np.zeros((len(uniq), nc), vals.dtype)
        np.add.at(arr, (inv, cellidx[m]), v[m])
        arrays.append(arr.reshape((len(uniq),) + col_grid))
        offsets.append(tuple(tuple(int(o) for o in u) for u in uniq))
    nnz = int(np.count_nonzero(vals[valid]))
    return PhaseStencil(tuple(arrays), tuple(offsets), row_grid,
                        col_grid, ratio, trans=False, _nnz=nnz)


# ---------------------------------------------------------------------------
# Host-side constructors / converters
# ---------------------------------------------------------------------------

def ell_from_csr_arrays(indptr, indices, data, shape, width=None,
                        min_width: int = 1) -> ELL:
    """Build an ELL from host CSR triplet arrays (numpy).

    Entries within a row keep CSR order (callers should pass column-sorted
    CSR; scipy's ``sort_indices`` guarantees this).
    """
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    data = np.asarray(data)
    n = shape[0]
    row_nnz = np.diff(indptr).astype(np.int32)
    W = int(max(min_width, row_nnz.max() if n else 0)) if width is None else int(width)
    cols = np.zeros((n, W), dtype=np.int32)
    vals = np.zeros((n, W), dtype=data.dtype)
    # vectorized fill: position of each nnz within its row
    if len(indices):
        rows = np.repeat(np.arange(n), row_nnz)
        offs = np.arange(len(indices)) - np.repeat(indptr[:-1], row_nnz)
        cols[rows, offs] = indices
        vals[rows, offs] = data
    return ELL(cols, vals, row_nnz, (int(shape[0]), int(shape[1])))


def from_scipy(A, width=None):
    """Convert a scipy sparse matrix to device ELL (or BELL if BSR)."""
    import scipy.sparse as sp
    if sp.issparse(A) and A.format == "bsr" and A.blocksize != (1, 1):
        return bell_from_scipy(A, width=width)
    A = sp.csr_matrix(A) if not (sp.issparse(A) and A.format == "csr") else A
    A = A.copy()
    A.sort_indices()
    return ell_from_csr_arrays(A.indptr, A.indices, A.data, A.shape, width)


def bell_from_scipy(A, width=None) -> BELL:
    import scipy.sparse as sp
    A = sp.bsr_matrix(A) if not (sp.issparse(A) and A.format == "bsr") else A
    A = A.copy()
    A.sort_indices()
    br, bc = A.blocksize
    nb = A.shape[0] // br
    indptr, indices, data = A.indptr, A.indices, A.data
    row_nnz = np.diff(indptr).astype(np.int32)
    W = int(max(1, row_nnz.max() if nb else 0)) if width is None else int(width)
    cols = np.zeros((nb, W), dtype=np.int32)
    vals = np.zeros((nb, W, br, bc), dtype=data.dtype)
    if len(indices):
        rows = np.repeat(np.arange(nb), row_nnz)
        offs = np.arange(len(indices)) - np.repeat(indptr[:-1], row_nnz)
        cols[rows, offs] = indices
        vals[rows, offs] = data
    return BELL(cols, vals, row_nnz,
                (int(A.shape[0]), int(A.shape[1])), (int(br), int(bc)))


def to_scipy(A):
    """Convert ELL/BELL/DIA back to scipy CSR/BSR (host)."""
    import scipy.sparse as sp
    if isinstance(A, DIA):
        n = A.shape[0]
        data = np.asarray(A.data)[:, :n]
        M = sp.dia_matrix((np.stack([np.roll(data[d], off)
                                     for d, off in enumerate(A.offsets)]),
                           np.asarray(A.offsets)), shape=A.shape).tocsr()
        M.eliminate_zeros()
        return M
    if isinstance(A, BELL):
        nb = A.n_block_rows
        cols = np.asarray(A.cols)
        vals = np.asarray(A.vals)
        row_nnz = np.asarray(A.row_nnz)
        indptr = np.concatenate([[0], np.cumsum(row_nnz)]).astype(np.int64)
        mask = np.arange(A.width)[None, :] < row_nnz[:, None]
        indices = cols[mask]
        data = vals[mask]
        return sp.bsr_matrix((data, indices, indptr), shape=A.shape,
                             blocksize=A.blocksize)
    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals)
    row_nnz = np.asarray(A.row_nnz)
    indptr = np.concatenate([[0], np.cumsum(row_nnz)]).astype(np.int64)
    mask = np.arange(A.width)[None, :] < row_nnz[:, None]
    indices = cols[mask]
    data = vals[mask]
    return sp.csr_matrix((data, indices, indptr), shape=A.shape)


def asarray_or_ell(A, dtype=None):
    """Accept scipy / dense / ELL inputs uniformly (user-facing factories)."""
    import scipy.sparse as sp
    if isinstance(A, (ELL, BELL)):
        return A if dtype is None else A.astype(dtype)
    if sp.issparse(A):
        M = from_scipy(A)
        return M if dtype is None else M.astype(dtype)
    A = np.asarray(A)
    return from_scipy(__import__("scipy.sparse", fromlist=["csr_matrix"]).csr_matrix(A))


def eye(n, dtype=jnp.float32, width: int = 1) -> ELL:
    """Identity matrix as ELL (host-backed; setup-phase)."""
    cols = np.zeros((n, width), dtype=np.int32)
    cols[:, 0] = np.arange(n, dtype=np.int32)
    vals = np.zeros((n, width), dtype=dtype)
    vals[:, 0] = 1
    return ELL(cols, vals, np.ones((n,), np.int32), (n, n))


def ell_from_coo(rows, cols, vals, shape, width=None, sum_duplicates=True,
                 min_width: int = 1) -> ELL:
    """Device-side COO -> ELL with duplicate coalescing.

    All inputs are jax arrays of equal length ``m`` (may include padding
    entries flagged by ``rows == shape[0]`` which are dropped).  Entries are
    sorted by (row, col); duplicates are segment-summed.  The result width is
    data-dependent, so this helper is *setup-phase only* (not jittable as a
    whole); the internal sort/segment steps are jit-compiled pieces.
    """
    n = int(shape[0])
    # host sort + coalesce (concrete at setup; avoids int64-key pitfalls
    # when x64 is disabled)
    r_np = np.asarray(rows)
    c_np = np.asarray(cols)
    v_np = np.asarray(vals)
    keep = r_np < n
    r_np, c_np, v_np = r_np[keep], c_np[keep], v_np[keep]
    order = np.lexsort((c_np, r_np))
    r_np, c_np, v_np = r_np[order], c_np[order], v_np[order]
    if sum_duplicates and len(r_np):
        key = r_np.astype(np.int64) * np.int64(shape[1] + 1) + c_np
        head = np.concatenate([[True], key[1:] != key[:-1]])
        seg = np.cumsum(head) - 1
        v_np = np.bincount(seg, weights=v_np.real).astype(v_np.dtype) \
            if not np.iscomplexobj(v_np) else (
                np.bincount(seg, weights=v_np.real)
                + 1j * np.bincount(seg, weights=v_np.imag))
        r_np, c_np = r_np[head], c_np[head]
    counts = np.bincount(r_np, minlength=n).astype(np.int32)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return ell_from_csr_arrays(indptr, c_np, v_np, shape, width=width,
                               min_width=min_width)
