"""Static halo-exchange plans for distributed SpMV (shard_map + ppermute).

The reference has **no** distributed layer (SURVEY.md §0: all amg_core
kernels are serial loops, e.g. /root/reference/pyamg/amg_core/relaxation.h:49-76;
no MPI/NCCL anywhere).  This module is new TPU-native design — the
hypre-style "communication package" idea rebuilt for XLA:

Setup phase (host, numpy)
    Rows and columns of each level operator are 1-D block-partitioned over
    the mesh axis ``'rows'`` (n_loc = n_pad / ndev contiguous rows per
    device).  For every device pair with coupling we record *which* x
    entries must move — a static gather list per ring offset.  Because AMG
    levels keep grid locality, contiguous row blocks couple almost only to
    ring-neighbour blocks, so the exchange is a handful of ``ppermute``
    steps that ride ICI neighbour links (no all-gather of the full vector,
    which is what plain GSPMD sharding of the ELL gather falls back to).

Solve phase (device, jitted)
    ``HaloELL.mv`` runs under ``shard_map``: each device gathers its send
    buffers (one per ring offset), ``ppermute``s them, concatenates the
    received segments into a halo buffer, and does the local ELL SpMV on
    ``[x_local | halo]`` — columns were remapped to that local index space
    at plan-build time.  Krylov dot products outside the shard_map are
    plain ``jnp.vdot`` on sharded vectors; GSPMD inserts the ``psum``.

Communication volume per SpMV: sum of true halo sizes (padded per offset
to the max over devices) — for a 2-D Poisson level split into k blocks,
2·(k-1) messages of one grid-line each, overlapping-friendly and
independent of n.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:                                   # older jax
    from jax.experimental.shard_map import shard_map

from pyamg_tpu.sparse.matrix import ELL


@partial(jax.tree_util.register_dataclass,
         data_fields=("cols", "vals", "send_idx"),
         meta_fields=("offsets", "seg_sizes", "shape", "n_loc", "m_loc",
                      "mesh"))
@dataclasses.dataclass(frozen=True)
class HaloELL:
    """Row-partitioned ELL operator with a static halo-exchange plan.

    cols     -- (ndev, n_loc, W) int32, *local* column indices: values in
                ``[0, m_loc)`` address the device's own x block; values in
                ``[m_loc, m_loc + H)`` address the halo buffer (concatenated
                per-offset receive segments).  Padding slots point at 0.
    vals     -- (ndev, n_loc, W) matching values (0 in padding slots).
    send_idx -- tuple, one (ndev, S_o) int32 array per ring offset ``o``:
                row e holds the local x indices device e sends to device
                ``(e + o) % ndev`` (padded by repeating index 0; the
                receiver never reads padded slots).
    offsets  -- static tuple of ring offsets with any traffic.
    seg_sizes-- static tuple: padded receive-segment length per offset.
    """

    cols: jax.Array
    vals: jax.Array
    send_idx: Tuple[jax.Array, ...]
    offsets: Tuple[int, ...]
    seg_sizes: Tuple[int, ...]
    shape: Tuple[int, int]       # padded global (n_pad, m_pad)
    n_loc: int
    m_loc: int
    mesh: Mesh

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def ndev(self) -> int:
        return self.cols.shape[0]

    def halo_width(self) -> int:
        return int(sum(self.seg_sizes))

    def mv(self, x: jax.Array) -> jax.Array:
        """y = A @ x; x of global shape (m_pad,) sharded over 'rows'."""
        if x.ndim != 1:
            # multi-RHS: column-at-a-time (not on the distributed hot path)
            cols = [self.mv(x[:, j]) for j in range(x.shape[1])]
            return jnp.stack(cols, axis=1)
        ndev = self.ndev
        offsets, seg_sizes = self.offsets, self.seg_sizes

        def body(cols_b, vals_b, x_b, *sidx_b):
            xl = x_b                                   # (m_loc,)
            segs = []
            for o, sidx in zip(offsets, sidx_b):
                buf = xl[sidx[0]]                      # (S_o,)
                perm = [(e, (e + o) % ndev) for e in range(ndev)]
                segs.append(lax.ppermute(buf, "rows", perm))
            xfull = jnp.concatenate([xl] + segs) if segs else xl
            return (vals_b[0] * xfull[cols_b[0]]).sum(axis=1)

        blk3 = P("rows", None, None)
        blk2 = P("rows", None)
        f = shard_map(body, mesh=self.mesh,
                      in_specs=(blk3, blk3, P("rows")) +
                               tuple(blk2 for _ in offsets),
                      out_specs=P("rows"))
        return f(self.cols, self.vals, x, *self.send_idx)


def _pad_to(n: int, multiple: int) -> int:
    return n + ((-n) % multiple)


def build_halo(A: ELL, mesh: Mesh, identity_pad: bool = None) -> HaloELL:
    """Build a HaloELL from a host-backed ELL (numpy arrays).

    Pads rows/cols to mesh multiples (square operators get unit-diagonal
    pad rows so smoother diagonals stay finite), partitions rows into
    contiguous blocks, computes per-offset send lists, and remaps column
    indices to the local+halo index space.
    """
    ndev = int(mesh.devices.size)
    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals)
    rn = np.asarray(A.row_nnz)
    n, m = A.shape
    square = (n == m)
    if identity_pad is None:
        identity_pad = square

    n_pad = _pad_to(n, ndev)
    m_pad = _pad_to(m, ndev) if not square else n_pad
    n_loc, m_loc = n_pad // ndev, m_pad // ndev
    W = cols.shape[1]

    # pad row dimension; identity rows for square operators
    if n_pad > n:
        pc = np.zeros((n_pad - n, W), np.int32)
        pv = np.zeros((n_pad - n, W), vals.dtype)
        prn = np.zeros((n_pad - n,), np.int32)
        if identity_pad and square:
            pc[:, 0] = n + np.arange(n_pad - n)
            pv[:, 0] = 1
            prn[:] = 1
        cols = np.concatenate([cols, pc])
        vals = np.concatenate([vals, pv])
        rn = np.concatenate([rn, prn])

    # mask out padding slots so they don't generate halo traffic
    slot = np.arange(W)[None, :] < rn[:, None]
    cols_eff = np.where(slot, cols, 0)

    # per-(receiver, sender) needed-column lists
    row_dev = np.repeat(np.arange(ndev), n_loc)      # owner of each row
    col_dev = cols_eff // m_loc                      # owner of each entry's col
    need = [[None] * ndev for _ in range(ndev)]      # need[d][e] = sorted cols
    for d in range(ndev):
        blk = slice(d * n_loc, (d + 1) * n_loc)
        c = cols_eff[blk][slot[blk]]
        o = c // m_loc
        remote = c[o != d]
        ro = remote // m_loc
        for e in np.unique(ro):
            need[d][int(e)] = np.unique(remote[ro == e])

    # ring offsets with any traffic; padded segment size per offset
    offsets, seg_sizes, send_idx = [], [], []
    for o in range(1, ndev):
        sizes = [0 if need[d][(d - o) % ndev] is None
                 else len(need[d][(d - o) % ndev]) for d in range(ndev)]
        S = max(sizes)
        if S == 0:
            continue
        offsets.append(o)
        seg_sizes.append(S)
        sidx = np.zeros((ndev, S), np.int32)
        for e in range(ndev):                        # e sends to d=(e+o)%ndev
            lst = need[(e + o) % ndev][e]
            if lst is not None:
                sidx[e, :len(lst)] = lst - e * m_loc
        send_idx.append(sidx)

    # remap columns to local + halo index space per receiving device
    new_cols = np.zeros_like(cols)
    for d in range(ndev):
        blk = slice(d * n_loc, (d + 1) * n_loc)
        lut = np.zeros((m_pad,), np.int64)           # global col -> local idx
        own = np.arange(d * m_loc, (d + 1) * m_loc)
        lut[own] = np.arange(m_loc)
        base = m_loc
        for o, S in zip(offsets, seg_sizes):
            e = (d - o) % ndev
            lst = need[d][e]
            if lst is not None:
                lut[lst] = base + np.arange(len(lst))
            base += S
        new_cols[blk] = lut[cols_eff[blk]]
    new_cols = np.where(slot, new_cols, 0).astype(np.int32)

    blk3 = NamedSharding(mesh, P("rows", None, None))
    blk2 = NamedSharding(mesh, P("rows", None))
    return HaloELL(
        cols=jax.device_put(new_cols.reshape(ndev, n_loc, W), blk3),
        vals=jax.device_put(
            np.where(slot, vals, 0).reshape(ndev, n_loc, W), blk3),
        send_idx=tuple(jax.device_put(s, blk2) for s in send_idx),
        offsets=tuple(offsets), seg_sizes=tuple(seg_sizes),
        shape=(n_pad, m_pad), n_loc=n_loc, m_loc=m_loc, mesh=mesh)


def extract_diagonal_halo(H: HaloELL) -> jax.Array:
    """diag(A) for a square HaloELL, as a sharded (n_pad,) vector."""
    assert H.shape[0] == H.shape[1]
    loc = jnp.arange(H.n_loc, dtype=jnp.int32)
    hit = H.cols == loc[None, :, None]
    d = jnp.sum(jnp.where(hit, H.vals, 0), axis=2)   # (ndev, n_loc)
    d = d.reshape(-1)
    return jax.device_put(d, NamedSharding(H.mesh, P("rows")))
