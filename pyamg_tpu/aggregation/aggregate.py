"""Aggregation methods (reference ``pyamg/aggregation/aggregate.py``).

The reference's ``standard_aggregation`` is a 3-pass *sequential greedy*
C++ loop (``smoothed_aggregation.h:138-232``).  The TPU-native equivalent
(same quality class, data-parallel): distance-2 MIS seeding + strength-
weighted label propagation:

  pass 1: roots = MIS-2 on the strength graph  -> one aggregate per root
  pass 2: unaggregated nodes join the strongest neighboring aggregate
  pass 3: repeat propagation until fixed point (every node is within
          distance 2 of a root by MIS-2 maximality)

Returns (AggOp, Cpts): AggOp is an (n x nagg) ELL with one unit entry per
aggregated node (unaggregated nodes have empty rows, matching the
reference's convention used by ``fit_candidates`` edge cases).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL
from pyamg_tpu.graph import maximal_independent_set


def _neighbors_nodiag(C: ELL):
    n = C.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    mask = C.valid_mask() & (C.cols != rows)
    return C.cols, mask


def _aggop_from_labels(agg, nagg, dtype=jnp.float64):
    """(n,) labels (-1 = unaggregated) -> (n x nagg) unit ELL (host)."""
    agg = np.asarray(agg, np.int32)
    n = agg.shape[0]
    has = agg >= 0
    cols = np.where(has, agg, 0)[:, None]
    vals = np.where(has, 1.0, 0.0)[:, None].astype(dtype)
    row_nnz = has.astype(np.int32)
    return ELL(cols, vals, row_nnz, (n, int(nagg)))


@jax.jit
def _propagate_round(cols, mask, w, agg):
    """Unaggregated nodes adopt the label of their strongest labeled
    neighbor."""
    nagg_lab = agg[cols]                              # (n, W)
    ok = mask & (nagg_lab >= 0)
    score = jnp.where(ok, w, -jnp.inf)
    j = jnp.argmax(score, axis=1)
    best_ok = jnp.take_along_axis(ok, j[:, None], axis=1)[:, 0]
    best_lab = jnp.take_along_axis(nagg_lab, j[:, None], axis=1)[:, 0]
    return jnp.where((agg < 0) & best_ok, best_lab, agg)


def _csr_arrays(C: ELL):
    """Host CSR triplet of the (valid) pattern."""
    cols = np.asarray(C.cols)
    rn = np.asarray(C.row_nnz)
    mask = np.arange(C.width)[None, :] < rn[:, None]
    indices = cols[mask].astype(np.int32)
    indptr = np.concatenate([[0], np.cumsum(rn)]).astype(np.int32)
    return indptr, indices


def standard_aggregation(C: ELL, seed=0, max_rounds=None, method="greedy"):
    """Standard aggregation (reference ``aggregate.py:12``).

    ``method='greedy'`` runs the classic sequential 3-pass greedy in the
    native host core (exact reference coarse-grid quality);
    ``method='parallel'`` uses the MIS-2 + label-propagation device
    formulation (for on-device/distributed setup).
    """
    n = C.shape[0]
    if method == "greedy":
        from pyamg_tpu import _native
        indptr, indices = _csr_arrays(C)
        out = _native.standard_aggregation(n, indptr, indices)
        if out is not None:
            labels, cpts = out
            nagg = int(labels.max()) + 1 if len(labels) else 0
            if nagg > 0:
                return _aggop_from_labels(jnp.asarray(labels), nagg,
                                          C.vals.dtype), np.asarray(cpts)
    return _standard_aggregation_parallel(C, seed=seed,
                                          max_rounds=max_rounds)


def _standard_aggregation_parallel(C: ELL, seed=0, max_rounds=None):
    """MIS-2-seeded data-parallel aggregation (device path)."""
    n = C.shape[0]
    mis = maximal_independent_set(C, k=2, seed=seed)
    roots = np.where(mis == 1)[0]
    nagg = len(roots)
    if nagg == 0:
        # fully decoupled graph: every node its own aggregate
        agg = jnp.arange(n, dtype=jnp.int32)
        return _aggop_from_labels(agg, n, C.vals.dtype), np.arange(n)
    agg = np.full(n, -1, np.int32)
    agg[roots] = np.arange(nagg)
    agg = jnp.asarray(agg)
    cols, mask = _neighbors_nodiag(C)
    w = jnp.abs(C.vals)
    rounds = max_rounds if max_rounds is not None else 3
    for _ in range(rounds):
        new = _propagate_round(cols, mask, w, agg)
        if bool(jnp.all(new == agg)):
            agg = new
            break
        agg = new
    return _aggop_from_labels(agg, nagg, C.vals.dtype), roots


def naive_aggregation(C: ELL, seed=0, method="greedy"):
    """Naive aggregation (reference ``aggregate.py:98``): greedy maximal
    independent aggregates (native host core) or MIS-1 device variant."""
    n = C.shape[0]
    if method == "greedy":
        from pyamg_tpu import _native
        indptr, indices = _csr_arrays(C)
        out = _native.naive_aggregation(n, indptr, indices)
        if out is not None:
            labels, cpts = out
            nagg = int(labels.max()) + 1 if len(labels) else 0
            if nagg > 0:
                return _aggop_from_labels(jnp.asarray(labels), nagg,
                                          C.vals.dtype), np.asarray(cpts)
    return _naive_aggregation_parallel(C, seed=seed)


def _naive_aggregation_parallel(C: ELL, seed=0):
    n = C.shape[0]
    mis = maximal_independent_set(C, k=1, seed=seed)
    roots = np.where(mis == 1)[0]
    nagg = len(roots)
    agg = np.full(n, -1, np.int32)
    agg[roots] = np.arange(nagg)
    agg = jnp.asarray(agg)
    cols, mask = _neighbors_nodiag(C)
    w = jnp.abs(C.vals)
    # one round: MIS-1 maximality puts every node within distance 1
    agg = _propagate_round(cols, mask, w, agg)
    # stragglers (zero rows): own aggregates appended
    agg_np = np.asarray(agg)
    left = np.where(agg_np < 0)[0]
    if len(left):
        agg_np[left] = nagg + np.arange(len(left))
        roots = np.concatenate([roots, left])
        nagg += len(left)
    return _aggop_from_labels(jnp.asarray(agg_np), nagg, C.vals.dtype), roots


def pairwise_aggregation(A, matchings=2, theta=0.25, norm="min", seed=0):
    """Notay pairwise aggregation by repeated matching
    (reference ``aggregate.py:181-310``).

    TPU-native matching: locally-heaviest-edge handshake rounds — node i
    points to its strongest unmatched neighbor; mutual pairs match.  Each
    matching halves the graph; ``matchings`` rounds compose.
    Returns (AggOp, Cpts).
    """
    from pyamg_tpu.ops.spgemm import spgemm
    from pyamg_tpu.sparse.matrix import ELL as _E

    if not isinstance(A, ELL):
        from pyamg_tpu.strength import _block_reduce
        A = _block_reduce(A, "min")

    n0 = A.shape[0]
    total = None                      # composed AggOp
    cur = A
    for m in range(matchings):
        agg, nagg = _one_matching(cur, seed=seed + m)
        T = _aggop_from_labels(agg, nagg, cur.vals.dtype)
        total = T if total is None else spgemm(total, T, width=1)
        if m + 1 < matchings:
            from pyamg_tpu.ops.transpose import transpose
            R = transpose(T)
            cur = spgemm(spgemm(R, cur), T)
    # AggOp entries should be unit
    vals = jnp.where(total.valid_mask(), 1.0, 0.0).astype(total.vals.dtype)
    total = _E(total.cols, vals, total.row_nnz, total.shape)
    agg_np = np.full(n0, -1, np.int64)
    cc = np.asarray(total.cols[:, 0])
    has = np.asarray(total.row_nnz) > 0
    agg_np[has] = cc[has]
    # Cpts: first member of each aggregate
    nagg = total.shape[1]
    Cpts = np.zeros(nagg, np.int64)
    seen = np.zeros(nagg, bool)
    for i in np.where(has)[0]:
        a = agg_np[i]
        if not seen[a]:
            seen[a] = True
            Cpts[a] = i
    return total, Cpts


def _one_matching(A: ELL, seed=0):
    """Heavy-edge handshake matching; unmatched nodes become singletons."""
    n = A.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    mask = A.valid_mask() & (A.cols != rows[:, None])
    # Notay: match along most negative off-diagonal. Use weight = -Re(a_ij).
    w = -jnp.real(A.vals)
    w = jnp.where(mask, w, -jnp.inf)
    scale = float(jnp.max(jnp.where(jnp.isfinite(w), jnp.abs(w), 0))) or 1.0
    partner = jnp.full((n,), -1, jnp.int32)
    rng = np.random.default_rng(seed)

    live = jnp.ones((n,), bool)
    for _ in range(12):
        # fresh random tie-break each round so equal-weight neighborhoods
        # (constant-coefficient stencils) still pair up
        tie = jnp.asarray(rng.random(n)) * (1e-6 * scale)
        key = w + tie[A.cols]
        ww = jnp.where(live[A.cols] & mask & live[:, None], key, -jnp.inf)
        j = jnp.argmax(ww, axis=1)
        tgt = jnp.take_along_axis(A.cols, j[:, None], axis=1)[:, 0]
        ok = jnp.take_along_axis(ww, j[:, None], axis=1)[:, 0] > -jnp.inf
        tgt = jnp.where(ok & live, tgt, -1)
        mutual = (tgt >= 0) & (tgt[jnp.where(tgt >= 0, tgt, 0)] == rows)
        partner = jnp.where(mutual & (partner < 0), tgt, partner)
        live = live & (partner < 0)
        if not bool(jnp.any(live)):
            break
    p = np.asarray(partner)
    agg = np.full(n, -1, np.int64)
    nagg = 0
    for i in range(n):
        if agg[i] >= 0:
            continue
        if p[i] >= 0 and p[p[i]] == i:
            agg[i] = agg[p[i]] = nagg
        else:
            agg[i] = nagg
        nagg += 1
    return jnp.asarray(agg, jnp.int32), nagg


def lloyd_aggregation(C: ELL, ratio=0.1, distance="unit", maxiter=10,
                      seed=0):
    """Lloyd-clustering aggregation (reference ``aggregate.py:313``)."""
    from pyamg_tpu.graph import lloyd_cluster
    n = C.shape[0]
    if distance == "unit":
        data = jnp.where(C.valid_mask(), 1.0, 0.0)
    elif distance == "abs":
        data = jnp.abs(C.vals)
    elif distance == "inv":
        data = 1.0 / jnp.maximum(jnp.abs(C.vals), 1e-300)
    else:
        raise ValueError(f"unrecognized distance {distance!r}")
    G = ELL(C.cols, data, C.row_nnz, C.shape)
    nagg = max(1, int(ratio * n))
    clusters, centers = lloyd_cluster(G, nagg, maxiter=maxiter)
    return _aggop_from_labels(jnp.asarray(clusters), nagg, C.vals.dtype), \
        centers


def balanced_lloyd_aggregation(C: ELL, num_clusters=None, maxiter=5, seed=0):
    """Balanced Lloyd (reference ``aggregate.py:424``): balanced
    Bellman-Ford assignment + per-cluster graph-median recentering."""
    if num_clusters is None:
        num_clusters = max(1, int(C.shape[0] ** 0.5))
    data = 1.0 / jnp.maximum(jnp.abs(C.vals), 1e-300)
    data = jnp.where(C.valid_mask(), data, 0)
    G = ELL(C.cols, data, C.row_nnz, C.shape)
    from pyamg_tpu.graph import balanced_lloyd_cluster
    clusters, centers = balanced_lloyd_cluster(G, num_clusters,
                                               maxiter=maxiter, seed=seed)
    return _aggop_from_labels(jnp.asarray(clusters), num_clusters,
                              C.vals.dtype), centers


def metis_aggregation(C: ELL, ratio=0.1, measure=None, seed=0):
    """METIS-based aggregation (reference ``aggregate.py:563``; default
    ratio 0.1 = coarsening by 10, matching the reference).

    Partitions the strength graph into ``ratio * n`` parts via pymetis
    when installed; otherwise falls back to balanced-Lloyd clustering,
    which has comparable balance properties (see ``graph.metis_partition``).
    ``measure``: edge weights as in the reference — None (ceil), 'range'
    (integers 1..10), 'unit' (all ones).
    """
    from pyamg_tpu.graph import metis_partition
    n = C.shape[0]
    nparts = max(1, int(ratio * n))
    if measure is None or measure == "unit":
        data = jnp.where(C.valid_mask(), 1.0, 0.0)
    elif measure == "range":
        data = jnp.where(C.valid_mask(),
                         jnp.round(9 * jnp.abs(C.vals)) + 1, 0.0)
    else:
        raise ValueError(f"Unrecognized value measure={measure}")
    G = ELL(C.cols, data, C.row_nnz, C.shape)
    parts = np.asarray(metis_partition(G, nparts, seed=seed))
    nagg = int(parts.max()) + 1
    return _aggop_from_labels(jnp.asarray(parts), nagg, C.vals.dtype), None


def grid_aggregation(C: ELL, ratio=3, grid=None):
    """Tile a tensor grid into ``ratio``-sized box aggregates.

    The TPU-structured analogue of ``standard_aggregation`` for stencil
    operators: when the matrix carries grid metadata, aggregates are
    axis-aligned tiles (``ratio`` per dim, default 3 — the SA coarsening
    rate on Poisson, reference ``smoothed_aggregation.h:138``'s greedy
    pass produces distance-1 aggregates of comparable size/quality).
    Grid-aligned tiles make the resulting prolongator *phase-structured*,
    unlocking the gather-free ``PhaseStencil`` transfer fast path.

    Returns ``(AggOp, Cpts)`` with ``AggOp.grid``/``AggOp.col_grid`` set
    to the fine/coarse grid shapes.
    """
    import dataclasses
    g = tuple(grid) if grid is not None else getattr(C, "grid", None)
    if g is None:
        raise ValueError("grid aggregation requires grid metadata "
                         "(A.grid or grid=...)")
    nd = len(g)
    if isinstance(ratio, int):
        ratio = (ratio,) * nd
    ratio = tuple(int(r) for r in ratio)
    cgrid = tuple(-(-g[d] // ratio[d]) for d in range(nd))
    n = int(np.prod(g))
    coords = np.stack(np.unravel_index(np.arange(n), g), axis=1)
    cell = coords // np.array(ratio)
    labels = np.ravel_multi_index(cell.T, cgrid).astype(np.int32)
    nagg = int(np.prod(cgrid))
    AggOp = _aggop_from_labels(jnp.asarray(labels), nagg,
                               dtype=C.dtype)
    AggOp = dataclasses.replace(AggOp, grid=g, col_grid=cgrid)
    # tile centers (clipped to the grid) as Cpts
    ccoords = np.stack(np.unravel_index(np.arange(nagg), cgrid), axis=1)
    centers = np.minimum(ccoords * np.array(ratio) + np.array(ratio) // 2,
                         np.array(g) - 1)
    Cpts = np.ravel_multi_index(centers.T, g).astype(np.int32)
    return AggOp, jnp.asarray(Cpts)


def aggregate_dispatch(C, spec, seed=0):
    from pyamg_tpu.relaxation.smoothing import unpack_arg
    name, opts = unpack_arg(spec)
    if name == "grid":
        return grid_aggregation(C, **opts)
    if name == "standard":
        return standard_aggregation(C, seed=seed, **opts)
    if name == "naive":
        return naive_aggregation(C, seed=seed, **opts)
    if name == "pairwise":
        return pairwise_aggregation(C, seed=seed, **opts)
    if name == "lloyd":
        return lloyd_aggregation(C, seed=seed, **opts)
    if name == "balanced lloyd":
        return balanced_lloyd_aggregation(C, seed=seed, **opts)
    if name == "metis":
        return metis_aggregation(C, seed=seed, **opts)
    if name == "predefined":
        return opts["AggOp"], opts.get("Cpts")
    raise ValueError(f"unrecognized aggregation method {name!r}")
