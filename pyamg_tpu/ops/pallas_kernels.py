"""Pallas TPU kernels for the solve-phase hot ops.

The V-cycle's per-op cost on small/medium levels is dominated by kernel
launches (~15 us each through XLA): the jnp DIA SpMV lowers to ~7 kernels
(pad + one shifted slice/multiply/add per diagonal).  The Pallas kernel
fuses the whole banded SpMV into ONE pass over HBM.

Unaligned shifted windows (diagonal offsets are rarely multiples of the
128-lane width) are built from 128-aligned vector loads plus an
in-register lane rotate: for offset ``o = q*128 + r``, load the aligned
window extended by one row, ``pltpu.roll`` by ``-r`` along lanes, and
select between adjacent rows per lane — two cheap VPU ops per diagonal
instead of an unaligned relayout.

Replaces the hot path of scipy CSR SpMV in the reference's solve phase
(``pyamg/multilevel.py:584-662``) for banded (stencil) operators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128
DIA_TILE = 8192           # rows per grid step (multiple of 8*128)

# Upper bound on the padded-x VMEM footprint we allow (bytes); v5e has
# ~16 MB VMEM per core and the kernel also stages data tiles.
_VMEM_X_BYTES = 8 * 1024 * 1024


def pallas_available():
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _extents(offsets):
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    # room for the aligned base of the most negative offset (off - r can
    # undershoot -lo by up to LANE-1) plus the +1-row extended load
    lo128 = -(-(lo + LANE - 1) // LANE) * LANE
    hi128 = -(-(hi + LANE) // LANE) * LANE
    return lo, lo128, hi128


@functools.lru_cache(maxsize=None)
def _dia_call(npad, ndiag, offsets, dtype_name):
    """Build (once per signature) the fused banded-SpMV pallas_call."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    tile = DIA_TILE
    rows = tile // LANE
    _, lo128, hi128 = _extents(offsets)
    xp_len = npad + lo128 + hi128

    def window(xp_ref, i, off):
        """(rows, LANE) window of xp starting at i*tile + lo128 + off."""
        q128 = (off // LANE) * LANE          # floor to lane multiple
        r = off - q128                        # 0 <= r < LANE
        base = i * tile + lo128 + q128        # 128-aligned by construction
        ext = xp_ref[0, pl.ds(base, tile + LANE)].reshape(rows + 1, LANE)
        if r == 0:
            return ext[:rows, :]
        # explicit i32 shift: under jax_enable_x64 a bare Python int
        # lowers to i64, which tpu.dynamic_rotate rejects
        rolled = pltpu.roll(ext, shift=jnp.int32(LANE - r), axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        return jnp.where(lane < LANE - r, rolled[:rows, :], rolled[1:, :])

    def kernel(data_ref, xp_ref, o_ref):
        i = pl.program_id(0)
        acc = data_ref[0, :].reshape(rows, LANE) * window(xp_ref, i,
                                                          offsets[0])
        for d in range(1, ndiag):
            acc += data_ref[d, :].reshape(rows, LANE) * window(
                xp_ref, i, offsets[d])
        o_ref[...] = acc

    return pl.pallas_call(
        kernel,
        grid=(npad // tile,),
        in_specs=[
            pl.BlockSpec((ndiag, tile), lambda i: (jnp.int32(0), jnp.int32(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full padded x
        ],
        out_specs=pl.BlockSpec((rows, LANE), lambda i: (jnp.int32(i), jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad // LANE, LANE), dtype),
    )


def dia_spmv_pallas(A, x):
    """Fused banded SpMV: y = A @ x for DIA A, single TPU kernel.

    Requires ``A.data`` row-padded to a multiple of DIA_TILE (the
    ``dia_from_ell`` builder guarantees this).  Returns None when the
    signature is unsupported (caller falls back to the jnp formulation).
    """
    if x.ndim != 1:
        return None
    n = A.shape[0]
    npad = A.data.shape[1]
    if npad % DIA_TILE != 0:
        return None
    offs = tuple(int(o) for o in A.offsets)
    _, lo128, hi128 = _extents(offs)
    xp_len = npad + lo128 + hi128
    dt = jnp.dtype(A.data.dtype)
    if dt.itemsize != 4 or xp_len * dt.itemsize > _VMEM_X_BYTES:
        return None
    call = _dia_call(npad, len(offs), offs, dt.name)
    xp = jnp.pad(x.astype(A.data.dtype), (lo128, xp_len - lo128 - n))
    y = call(A.data, xp[None, :])
    return y.reshape(-1)[:n]


@functools.lru_cache(maxsize=None)
def _dia_gs_call(npad, ndiag, offsets, n_order, dtype_name):
    """Fused multicolor Gauss-Seidel sweep sequence for banded (DIA)
    operators: ONE kernel runs the whole color-pass order (e.g. a
    symmetric 2-color sweep = 4 passes) with x resident in VMEM.

    grid = (n_passes, n_tiles), pass-major: each pass recomputes the
    tile residual from the CURRENT x and updates only its color's rows —
    bit-identical math to the jnp color loop (multicolor GS is
    order-independent within a color), minus ~one HLO dispatch per
    matvec/mask op.  The per-application HBM traffic drops to the
    streamed A tiles (b, Dinv, colors tiles ride along); x never leaves
    VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    tile = DIA_TILE
    rows = tile // LANE
    _, lo128, hi128 = _extents(offsets)
    xp_len = npad + lo128 + hi128
    ntiles = npad // tile

    def window(x_ref, t, off):
        q128 = (off // LANE) * LANE
        r = off - q128
        base = t * tile + lo128 + q128
        ext = x_ref[0, pl.ds(base, tile + LANE)].reshape(rows + 1, LANE)
        if r == 0:
            return ext[:rows, :]
        rolled = pltpu.roll(ext, shift=jnp.int32(LANE - r), axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        return jnp.where(lane < LANE - r, rolled[:rows, :], rolled[1:, :])

    def kernel(order_ref, om_ref, data_ref, b_ref, dinv_ref, col_ref,
               x0_ref, o_ref):
        p = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when((p == 0) & (t == 0))
        def _():
            o_ref[...] = x0_ref[...]

        acc = data_ref[0, :].reshape(rows, LANE) * window(o_ref, t,
                                                          offsets[0])
        for d in range(1, ndiag):
            acc += data_ref[d, :].reshape(rows, LANE) * window(
                o_ref, t, offsets[d])
        r = b_ref[...] - acc
        c = order_ref[p]
        m = col_ref[...] == c
        base = t * tile + lo128
        xt = o_ref[0, pl.ds(base, tile)].reshape(rows, LANE)
        xn = jnp.where(m, xt + om_ref[0] * dinv_ref[...] * r, xt)
        o_ref[0, pl.ds(base, tile)] = xn.reshape(tile)

    return pl.pallas_call(
        kernel,
        grid=(n_order, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # order
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # omega
            pl.BlockSpec((ndiag, tile),
                         lambda p, t: (jnp.int32(0), jnp.int32(t)),
                         memory_space=pltpu.VMEM),                  # data
            pl.BlockSpec((rows, LANE),
                         lambda p, t: (jnp.int32(t), jnp.int32(0)),
                         memory_space=pltpu.VMEM),                  # b
            pl.BlockSpec((rows, LANE),
                         lambda p, t: (jnp.int32(t), jnp.int32(0)),
                         memory_space=pltpu.VMEM),                  # Dinv
            pl.BlockSpec((rows, LANE),
                         lambda p, t: (jnp.int32(t), jnp.int32(0)),
                         memory_space=pltpu.VMEM),                  # colors
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # x0
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, xp_len), dtype),
    )


def dia_gs_sweep(A, x, b, Dinv, colors, order, omega=1.0):
    """Fused multicolor GS color-pass sequence on a DIA operator; None
    if the signature is unsupported (caller falls back to the jnp color
    loop).  ``order``: static tuple of color indices to sweep."""
    if x.ndim != 1 or len(order) == 0:
        return None
    n = A.shape[0]
    npad = A.data.shape[1]
    if npad % DIA_TILE != 0:
        return None
    offs = tuple(int(o) for o in A.offsets)
    _, lo128, hi128 = _extents(offs)
    xp_len = npad + lo128 + hi128
    dt = jnp.dtype(A.data.dtype)
    if dt.itemsize != 4 or jnp.issubdtype(dt, jnp.complexfloating) or \
            xp_len * dt.itemsize > _VMEM_X_BYTES:
        return None
    call = _dia_gs_call(npad, len(offs), offs, len(order), dt.name)

    def pad2(v, dtv, fill=0):
        vp = jnp.full((npad,), fill, dtv)
        vp = vp.at[:n].set(v.astype(dtv))
        return vp.reshape(npad // LANE, LANE)

    xp = jnp.pad(x.astype(dt), (lo128, xp_len - lo128 - n))[None, :]
    out = call(jnp.asarray(order, jnp.int32), jnp.asarray([omega], dt),
               A.data, pad2(b, dt), pad2(Dinv, dt),
               pad2(colors, jnp.int32, fill=-1), xp)
    return out[0, lo128:lo128 + n]
