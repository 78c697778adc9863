"""Row partitioning of hierarchies over a device mesh.

Strategy (new design; the reference has no distributed layer):

* pad each level's row dimension to a multiple of the mesh size (padded
  rows are identity rows so smoothers/diagonals stay well-defined; padded
  vector entries remain exactly zero through every cycle op);
* shard ``cols/vals/row_nnz`` and all same-length vectors with
  ``NamedSharding(mesh, P('rows', ...))``;
* below ``replicate_below`` unknowns, keep the level fully replicated —
  coarse grids are too small to win from distribution, and a replicated
  tail avoids latency-bound collectives (SURVEY.md §7.1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyamg_tpu.sparse.matrix import ELL, BELL


def make_row_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("rows",))


def pad_matrix_rows(A: ELL, multiple: int, identity_pad=True) -> ELL:
    """Pad the row dimension to a multiple; padded rows get a unit diagonal
    (within the padded square extent) so Dinv stays finite."""
    n, m = A.shape
    npad = (-n) % multiple
    if npad == 0:
        return A
    W = A.width
    pc = jnp.zeros((npad, W), jnp.int32)
    pv = jnp.zeros((npad, W), A.vals.dtype)
    prn = jnp.zeros((npad,), jnp.int32)
    if identity_pad and n + npad <= m + npad:  # square-ish operators
        # unit diagonal at the padded coordinates (valid if matrix square)
        if n == m:
            pc = pc.at[:, 0].set(n + jnp.arange(npad, dtype=jnp.int32))
            pv = pv.at[:, 0].set(1)
            prn = jnp.ones((npad,), jnp.int32)
    new_m = m + npad if n == m else m
    return ELL(jnp.concatenate([A.cols, pc]),
               jnp.concatenate([A.vals, pv]),
               jnp.concatenate([A.row_nnz, prn]),
               (n + npad, new_m))


def shard_matrix(A, mesh: Mesh):
    """Place ELL/BELL arrays with row sharding on the mesh."""
    row_sh = NamedSharding(mesh, P("rows", None))
    vec_sh = NamedSharding(mesh, P("rows"))
    if isinstance(A, BELL):
        blk_sh = NamedSharding(mesh, P("rows", None, None, None))
        return BELL(jax.device_put(A.cols, row_sh),
                    jax.device_put(A.vals, blk_sh),
                    jax.device_put(A.row_nnz, vec_sh),
                    A.shape, A.blocksize)
    return ELL(jax.device_put(A.cols, row_sh),
               jax.device_put(A.vals, row_sh),
               jax.device_put(A.row_nnz, vec_sh),
               A.shape)


def replicate(A, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), A)


def shard_vector(v, mesh: Mesh):
    return jax.device_put(v, NamedSharding(mesh, P("rows")))


def shard_hierarchy(ml, mesh: Mesh, replicate_below=2048, spmv="gspmd"):
    """Re-place a MultilevelSolver's level arrays across the mesh.

    Levels with more rows than ``replicate_below`` are row-sharded (their
    row dimension padded to a mesh multiple); smaller levels and the
    coarse-solver factorization are replicated.  Returns ml (modified in
    place; cycle cache cleared).

    spmv='gspmd'  shard the ELL arrays and let GSPMD insert the collectives
                  for the ``x[cols]`` gather (simple, but all-gathers x).
    spmv='halo'   convert each sharded level operator to a ``HaloELL`` with
                  a static ppermute halo-exchange plan (neighbour traffic
                  only — the production multi-chip path).
    """
    ndev = mesh.devices.size
    ml._fine_n = ml.levels[0].A.shape[0]

    for i, lvl in enumerate(ml.levels):
        n = lvl.A.shape[0]
        if n > replicate_below and isinstance(lvl.A, ELL):
            if spmv == "halo":
                from pyamg_tpu.parallel.halo import build_halo
                lvl.A = build_halo(lvl.A, mesh)
            else:
                lvl.A = shard_matrix(_pad_square(lvl.A, ndev), mesh)
            # P: rows follow this level; R: rows follow the coarse level
            if lvl.P is not None:
                lvl.P = shard_matrix(pad_matrix_rows(lvl.P, ndev,
                                                     identity_pad=False),
                                     mesh)
            if lvl.R is not None and lvl.R.shape[0] > replicate_below:
                lvl.R = shard_matrix(pad_matrix_rows(lvl.R, ndev,
                                                     identity_pad=False),
                                     mesh)
            elif lvl.R is not None:
                lvl.R = replicate(lvl.R, mesh)
            lvl.pre = (lvl.pre[0], lvl.pre[1],
                       _shard_params(lvl.pre[2], n, ndev, mesh))
            lvl.post = (lvl.post[0], lvl.post[1],
                        _shard_params(lvl.post[2], n, ndev, mesh))
        else:
            lvl.A = replicate(lvl.A, mesh)
            if lvl.P is not None:
                lvl.P = replicate(lvl.P, mesh)
            if lvl.R is not None:
                lvl.R = replicate(lvl.R, mesh)
            lvl.pre = (lvl.pre[0], lvl.pre[1], replicate(lvl.pre[2], mesh))
            lvl.post = (lvl.post[0], lvl.post[1],
                        replicate(lvl.post[2], mesh))
    ml.coarse_solver.params = replicate(ml.coarse_solver.params, mesh)
    ml._cycle_cache.clear()
    ml._mesh = mesh
    return ml


def _pad_square(A: ELL, multiple: int) -> ELL:
    """Pad a square operator's rows AND columns with unit-diagonal rows."""
    n, m = A.shape
    assert n == m
    return pad_matrix_rows(A, multiple, identity_pad=True)


def _shard_params(params, n, ndev, mesh):
    """Shard per-row smoother params (Dinv, colors, masks); replicate the
    rest (scalars, small blocks)."""
    out = {}
    for k, v in params.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1 and \
                v.shape[0] == n + ((-n) % ndev):
            out[k] = jax.device_put(
                v, NamedSharding(mesh, P("rows", *([None] * (v.ndim - 1)))))
        elif hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1 and \
                v.shape[0] == n:
            vp = _pad_vec(v, ndev, k)
            out[k] = jax.device_put(
                vp, NamedSharding(mesh, P("rows", *([None] * (v.ndim - 1)))))
        else:
            out[k] = v if not hasattr(v, "shape") else \
                jax.device_put(v, NamedSharding(mesh, P()))
    return out


def _pad_vec(v, multiple, name=""):
    n = v.shape[0]
    npad = (-n) % multiple
    if npad == 0:
        return v
    pad_val = 0
    if name == "colors":
        pad_val = -1
    pad = jnp.full((npad,) + v.shape[1:], pad_val, v.dtype)
    return jnp.concatenate([v, pad])
