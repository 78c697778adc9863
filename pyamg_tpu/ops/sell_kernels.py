"""Pallas TPU kernels for SELL operators: fused SpMV and hybrid-GS sweeps.

One ``pallas_call`` per SpMV / per smoother sweep — the whole pass plan
(see ``sparse/sell.py``) executes on-chip with ``x`` resident in VMEM,
replacing the reference's scipy CSR matvec / sequential C++ Gauss-Seidel
(``/root/reference/pyamg/multilevel.py:584-662``, ``relaxation.h:49``).

Numerics are exact f32 (no MXU rounding): every pass is a lane-gather +
select + fma on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyamg_tpu.sparse.sell import SELL, LANE, TILE_SUBLANES


def pallas_available():
    from pyamg_tpu.ops.pallas_kernels import pallas_available as _pa
    return _pa()


@functools.lru_cache(maxsize=None)
def _spmv_call(T, Sy, Sx, x_rows, t, kind, K, pad_top, dtype_name,
               interpret=False):
    """Fused SpMV kernel.

    ``tall`` operators receive x pre-expanded (each x2 row repeated ``t``
    times, so operand row ``sigma`` is x2 row ``sigma // t``); the window
    step then becomes a stride-``t`` sublane shift — the kernel itself is
    the square kernel with scaled bases.  ``fat`` operators read stride-t
    decimated slices via a reshape.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    step = t if kind == "tall" else 1
    span = Sy if kind == "tall" else Sx

    def kernel(bases_ref, delta_ref, vals_ref, x2_ref, o_ref):
        p = pl.program_id(0)
        w = bases_ref[p]
        d = delta_ref[0]
        lane = d & (LANE - 1)
        ksel = d >> 7
        contrib = jnp.zeros((Sy, LANE), dtype)
        for k in range(K):
            sl = x2_ref[pl.ds(pad_top + step * (w + k), span), :]
            if kind == "fat" and t > 1:
                O = sl.reshape(Sy, t, LANE)[:, 0, :]
            else:
                O = sl
            g = jnp.take_along_axis(O, lane, axis=1)
            contrib = jnp.where(ksel == k, g, contrib)
        upd = vals_ref[0] * contrib

        @pl.when(p == 0)
        def _():
            o_ref[...] = upd

        @pl.when(p > 0)
        def _():
            o_ref[...] += upd

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # bases
            pl.BlockSpec((1, Sy, LANE), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),                 # delta
            pl.BlockSpec((1, Sy, LANE), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),                 # vals
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # x2
        ],
        out_specs=pl.BlockSpec((Sy, LANE), lambda p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sy, LANE), dtype),
        interpret=interpret,
    )


def _pad_x(A: SELL, x):
    """Stage x into the kernel's operand layout (tall: row-expanded)."""
    m = A.shape[1]
    Sx = A.Sx
    xp = jnp.pad(x.astype(A.vals.dtype), (0, Sx * LANE - m))
    x2 = xp.reshape(Sx, LANE)
    if A.kind == "tall" and A.t > 1:
        x2 = jnp.repeat(x2, A.t, axis=0)               # (Sy, 128)
    rows = x2.shape[0]
    return jnp.pad(x2, ((A.pad_top, A.x_rows - A.pad_top - rows), (0, 0)))


# x footprint beyond which the square kernel streams x via windowed DMA
# instead of keeping all of it VMEM-resident (v5e VMEM ~16 MB/core; the
# kernel also stages a (T, TRow, 128) vals+delta block pair)
_VMEM_X_BUDGET = 6 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _spmv_tiled_call(bases_static, Sy, K, TRow, dtype_name,
                     interpret=False):
    """Tiled square-SELL SpMV: x streams through the normal BlockSpec
    pipeline as two neighbouring (TRow, 128) blocks per output tile —
    this is what scales the kernel past VMEM (n = 10^7+), and it writes
    each output element exactly once (the VMEM-resident kernel revisits
    the output per pass).

    Two deliberate choices, both load-bearing for Mosaic:
    * ``bases_static`` (the per-pass window bases, a handful of ints) are
      baked in as constants, so every x read has a STATIC sublane offset.
      Dynamic sublane starts force full-buffer relayouts (measured 15
      ms/tile; same reason the DIA kernel uses aligned loads + lane
      rolls).
    * No manual ``make_async_copy``: on this toolchain a kernel
      containing an HBM->VMEM DMA takes 200-400 s to compile (vs seconds
      for the same math through the auto-pipelined BlockSpec path).

    Requires the coupling span ``(base_hi - base_lo + K - 1) <= TRow``
    so every window fits in the tile's own x block plus its successor;
    the caller pads x so tile i's window starts inside x-block i.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    T = len(bases_static)
    ntiles = Sy // TRow
    base_lo = min(bases_static)
    lead = -base_lo        # signed: the caller aligns x so tile i's
                           # window starts at x-block i, row 0

    def kernel(delta_ref, vals_ref, xa_ref, xb_ref, o_ref):
        acc = jnp.zeros((TRow, LANE), dtype)
        for p, w in enumerate(bases_static):
            d = delta_ref[p]
            lane = d & (LANE - 1)
            ksel = d >> 7
            contrib = jnp.zeros((TRow, LANE), dtype)
            for k in range(K):
                s = w + k + lead                    # static, in [0, TRow]
                if s == 0:
                    O = xa_ref[...]
                elif s < TRow:
                    O = jnp.concatenate(
                        [xa_ref[s:, :], xb_ref[:s, :]], axis=0)
                else:
                    O = xb_ref[s - TRow:s, :]
                g = jnp.take_along_axis(O, lane, axis=1)
                contrib = jnp.where(ksel == k, g, contrib)
            acc = acc + vals_ref[p] * contrib
        o_ref[...] = acc

    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((T, TRow, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),                 # delta
            pl.BlockSpec((T, TRow, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),                 # vals
            pl.BlockSpec((TRow, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                 # x blk i
            pl.BlockSpec((TRow, LANE), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),                 # x blk i+1
        ],
        out_specs=pl.BlockSpec((TRow, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sy, LANE), dtype),
        interpret=interpret,
    )


_TILE_BLOCK_BUDGET = 6 * 1024 * 1024   # per-tile VMEM for vals+delta+x blocks


def _pick_tile_rows(T, K, span, Sy):
    """Largest row-tile that fits the budget and covers the span."""
    for TRow in (512, 256, 128, 64, 32, 16, 8):
        if Sy % TRow != 0 or span > TRow:
            continue
        blk = 2 * T * TRow * LANE * 4 + 3 * TRow * LANE * 4
        if blk <= _TILE_BLOCK_BUDGET:
            return TRow
    return None


def _pad_x_tiled(A: SELL, x, TRow):
    """x staged for the tiled kernel: shifted so tile i's coupling window
    begins at x-block i row 0 (x element ``128*base_lo`` lands at row 0),
    with one extra block at the end for the window tails."""
    m = A.shape[1]
    ntiles = A.Sy // TRow
    total = (ntiles + 1) * TRow * LANE
    start = A.base_lo * LANE
    xv = x.astype(A.vals.dtype)
    if start < 0:
        xv = jnp.pad(xv, (-start, 0))
    elif start > 0:
        xv = xv[start:]
    xp = jnp.pad(xv, (0, total - xv.shape[0]))
    return xp.reshape((ntiles + 1) * TRow, LANE)


def sell_spmv(A: SELL, x, interpret=False):
    """y = A @ x, one fused TPU kernel (tiled neighbour-block variant
    when x exceeds the VMEM budget on square operators)."""
    if x.ndim == 2:
        return jax.vmap(lambda c: sell_spmv(A, c, interpret),
                        in_axes=1, out_axes=1)(x)
    big = A.x_rows * LANE * 4 > _VMEM_X_BUDGET
    if A.kind == "tall" and A.t == 1 and big:
        span = A.base_hi - A.base_lo + A.K - 1
        TRow = _pick_tile_rows(A.n_passes, A.K, span, A.Sy)
        if TRow is not None:
            call = _spmv_tiled_call(tuple(A.bases), A.Sy, A.K, TRow,
                                    jnp.dtype(A.vals.dtype).name,
                                    interpret)
            xp = _pad_x_tiled(A, x, TRow)
            y = call(A.delta, A.vals, xp, xp)
            return y.reshape(-1)[:A.shape[0]]
    call = _spmv_call(A.n_passes, A.Sy, A.Sx, A.x_rows, A.t, A.kind, A.K,
                      A.pad_top, jnp.dtype(A.vals.dtype).name, interpret)
    y = call(jnp.asarray(A.bases, jnp.int32), A.delta, A.vals,
             _pad_x(A, x))
    return y.reshape(-1)[:A.shape[0]]


# ---------------------------------------------------------------------------
# Fused hybrid Gauss-Seidel sweep (square SELL only)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _gs_call(T, Sy, x_rows, K, pad_top, reverse, dtype_name,
             interpret=False):
    """One Gauss-Seidel sweep: sequential 1024-row tiles, x in VMEM.

    Tiles update in (reversed) order; rows within a tile update Jacobi-style
    from the tile-entry state — the TPU analogue of the reference's
    sequential row sweep (``relaxation.h:49``), with smoothing quality
    asserted at the convergence-factor level (SURVEY.md §7.3).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    TR = TILE_SUBLANES
    ntiles = Sy // TR

    def tidx(p):
        return (ntiles - 1 - p) if reverse else p

    def kernel(bases_ref, om_ref, delta_ref, vals_ref, b_ref, dinv_ref,
               x0_ref, o_ref):
        p = pl.program_id(0)

        @pl.when(p == 0)
        def _():
            o_ref[...] = x0_ref[...]

        tile = (ntiles - 1 - p) if reverse else p
        row0 = pad_top + tile * TR

        def body(pp, r):
            w = bases_ref[pp]
            d = delta_ref[pl.ds(pp, 1)][0]
            lane = d & (LANE - 1)
            ksel = d >> 7
            start0 = row0 + w
            contrib = jnp.zeros((TR, LANE), dtype)
            for k in range(K):
                O = o_ref[pl.ds(start0 + k, TR), :]
                g = jnp.take_along_axis(O, lane, axis=1)
                contrib = jnp.where(ksel == k, g, contrib)
            return r - vals_ref[pl.ds(pp, 1)][0] * contrib

        r = jax.lax.fori_loop(0, T, body, b_ref[...])
        xt = o_ref[pl.ds(row0, TR), :]
        o_ref[pl.ds(row0, TR), :] = xt + om_ref[0] * dinv_ref[...] * r

    def imap3(p):
        return (0, tidx(p), 0)

    def imap2(p):
        return (tidx(p), 0)

    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # bases
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # omega
            pl.BlockSpec((T, TR, LANE), imap3,
                         memory_space=pltpu.VMEM),                 # delta
            pl.BlockSpec((T, TR, LANE), imap3,
                         memory_space=pltpu.VMEM),                 # vals
            pl.BlockSpec((TR, LANE), imap2,
                         memory_space=pltpu.VMEM),                 # b
            pl.BlockSpec((TR, LANE), imap2,
                         memory_space=pltpu.VMEM),                 # Dinv
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # x0
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x_rows, LANE), dtype),
        interpret=interpret,
    )


def _pad_rows(A: SELL, v, rows, lead_rows=0):
    n = A.shape[0]
    lead = lead_rows * LANE
    vp = jnp.pad(v.astype(A.vals.dtype), (lead, rows * LANE - lead - n))
    return vp.reshape(rows, LANE)


def sell_gs_sweep(A: SELL, x, b, Dinv, omega=1.0, sweep="forward",
                  interpret=False):
    """One (or one symmetric pair of) fused GS sweep(s) on a square SELL."""
    assert A.kind == "tall" and A.t == 1, "GS needs a square SELL"
    if sweep == "symmetric":
        x = sell_gs_sweep(A, x, b, Dinv, omega, "forward", interpret)
        return sell_gs_sweep(A, x, b, Dinv, omega, "backward", interpret)
    reverse = sweep == "backward"
    dt = jnp.dtype(A.vals.dtype)
    call = _gs_call(A.n_passes, A.Sy, A.x_rows, A.K, A.pad_top, reverse,
                    dt.name, interpret)
    b2 = _pad_rows(A, b, A.Sy)
    d2 = _pad_rows(A, Dinv, A.Sy)
    x2 = _pad_rows(A, x, A.x_rows, lead_rows=A.pad_top)
    om = jnp.asarray([omega], dt)
    xn = call(jnp.asarray(A.bases, jnp.int32), om, A.delta, A.vals,
              b2, d2, x2)
    return xn.reshape(-1)[A.pad_top * LANE: A.pad_top * LANE + A.shape[0]]
