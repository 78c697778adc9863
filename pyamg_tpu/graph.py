"""Graph algorithms as data-parallel fixed-point iterations.

Reference: ``pyamg/graph.py`` + C++ ``graph.h``.  The reference's "parallel"
algorithms (Luby MIS ``graph.h:140``, Jones-Plassmann coloring
``graph.h:297``, Bellman-Ford ``graph.h:671``) are executed serially there;
here they are the *native* formulation: each round is a vectorized
neighborhood reduction over the ELL adjacency, iterated to a fixed point
(host-side loop over jitted rounds — setup phase).

Graph input convention: ``G`` is an ELL matrix whose sparsity is the edge
set (values = edge weights where relevant).  Self loops are ignored.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL

_BIG = jnp.inf


def _neighbors(G: ELL):
    """(cols, mask) with self-loops masked out."""
    n = G.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    mask = G.valid_mask() & (G.cols != rows)
    return G.cols, mask


# ---------------------------------------------------------------------------
# Maximal independent set (Luby rounds)  — reference graph.h:140
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=())
def _mis_round(cols, mask, state, keys):
    """One Luby round. state: 0 active, 1 in-MIS, -1 removed."""
    active = state == 0
    # neighbor keys; inactive neighbors get -inf so they don't block
    nk = keys[cols]
    nactive = active[cols] & mask
    nk = jnp.where(nactive, nk, -jnp.inf)
    nmax = jnp.max(nk, axis=1)
    winner = active & (keys > nmax)
    # neighbors of winners get removed
    nwin = jnp.any(winner[cols] & mask, axis=1)
    state = jnp.where(winner, 1, state)
    state = jnp.where((state == 0) & nwin, -1, state)
    return state


def maximal_independent_set(G: ELL, algo="parallel", k=1, weights=None,
                            seed=0, max_iters=None):
    """Distance-k maximal independent set. Returns int8 array (1 = in MIS).

    Parity: reference ``graph.py:33`` / ``graph.h:140`` (parallel Luby) and
    ``graph.h:974`` (distance-k).  ``weights`` biases selection (PMIS).
    """
    n = G.shape[0]
    Gk = G
    if k > 1:
        from pyamg_tpu.ops.spgemm import spgemm
        for _ in range(k - 1):
            Gk = spgemm(Gk, G)
    cols, mask = _neighbors(Gk)
    rng = np.random.default_rng(seed)
    perm = jnp.asarray(rng.permutation(n).astype(np.float64))
    if weights is not None:
        keys = jnp.asarray(weights, jnp.float64) * n + perm
    else:
        keys = perm
    state = jnp.zeros((n,), jnp.int8)
    it = 0
    while bool(jnp.any(state == 0)):
        state = _mis_round(cols, mask, state, keys)
        it += 1
        if max_iters is not None and it >= max_iters:
            break
        if it > n + 2:
            raise RuntimeError("MIS failed to converge")
    return np.asarray((state == 1).astype(np.int8))


# ---------------------------------------------------------------------------
# Vertex coloring (Jones-Plassmann)  — reference graph.h:297, :351
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(4,))
def _jp_round(cols, mask, color, keys, maxdeg):
    uncolored = color < 0
    nk = jnp.where(uncolored[cols] & mask, keys[cols], -jnp.inf)
    winner = uncolored & (keys > jnp.max(nk, axis=1))
    # smallest color not used by already-colored neighbors
    ncol = jnp.where(mask, color[cols], -1)             # (n, W)
    cand = jnp.arange(maxdeg + 1, dtype=jnp.int32)       # (W+1,)
    used = jnp.any(ncol[:, :, None] == cand[None, None, :], axis=1)
    avail = jnp.argmin(used.astype(jnp.int32), axis=1).astype(jnp.int32)
    return jnp.where(winner, avail, color)


def _vertex_coloring_host(G: ELL, method, seed):
    """numpy twin of the JP/LDF rounds (setup phase runs entirely on the
    host: each eager device dispatch costs ~ms over the accelerator
    tunnel and each distinct shape a fresh XLA compile)."""
    n = G.shape[0]
    cols = np.asarray(G.cols)
    rows = np.arange(n, dtype=np.int32)[:, None]
    mask = np.asarray(G.valid_mask()) & (cols != rows)
    maxdeg = int(G.width)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n).astype(np.float64)
    if method in ("LDF", "ldf"):
        keys = mask.sum(axis=1).astype(np.float64) * n + perm
    else:
        keys = perm
    color = np.full((n,), -1, np.int32)
    cand = np.arange(maxdeg + 1, dtype=np.int32)
    it = 0
    while (color < 0).any():
        uncolored = color < 0
        nk = np.where(uncolored[cols] & mask, keys[cols], -np.inf)
        winner = uncolored & (keys > nk.max(axis=1))
        ncol = np.where(mask, color[cols], -1)
        used = (ncol[:, :, None] == cand[None, None, :]).any(axis=1)
        avail = used.argmin(axis=1).astype(np.int32)
        color = np.where(winner, avail, color)
        it += 1
        if it > n + 2:
            raise RuntimeError("coloring failed to converge")
    return color


def vertex_coloring(G: ELL, method="JP", seed=0):
    """Greedy parallel graph coloring; returns int32 colors (>= 0).

    'JP' uses random weights; 'LDF' (largest degree first) biases by degree.
    Parity: reference ``graph.py:84`` / ``graph.h:297,351``.
    """
    from pyamg_tpu.sparse.matrix import is_concrete
    if is_concrete(G.cols, G.vals):
        return _vertex_coloring_host(G, method, seed)
    n = G.shape[0]
    cols, mask = _neighbors(G)
    maxdeg = int(G.width)
    rng = np.random.default_rng(seed)
    perm = jnp.asarray(rng.permutation(n).astype(np.float64))
    if method in ("LDF", "ldf"):
        deg = jnp.sum(mask, axis=1).astype(jnp.float64)
        keys = deg * n + perm
    else:
        keys = perm
    color = jnp.full((n,), -1, jnp.int32)
    it = 0
    while bool(jnp.any(color < 0)):
        color = _jp_round(cols, mask, color, keys, maxdeg)
        it += 1
        if it > n + 2:
            raise RuntimeError("coloring failed to converge")
    return np.asarray(color)


# ---------------------------------------------------------------------------
# Bellman-Ford / clustering  — reference graph.h:671, graph.py:129-600
# ---------------------------------------------------------------------------

@jax.jit
def _bf_round(cols, mask, w, dist, nearest):
    """Relax all edges once: dist[i] <- min_j dist[j] + w(j->i).

    Our ELL rows give edges i->cols; for the symmetric distance use on
    strength graphs this is equivalent to the reference's edge relaxation.
    """
    nd = jnp.where(mask, dist[cols] + w, _BIG)
    j = jnp.argmin(nd, axis=1)
    best = jnp.take_along_axis(nd, j[:, None], axis=1)[:, 0]
    bcols = jnp.take_along_axis(cols, j[:, None], axis=1)[:, 0]
    better = best < dist
    new_dist = jnp.where(better, best, dist)
    new_near = jnp.where(better, nearest[bcols], nearest)
    return new_dist, new_near


def bellman_ford(G: ELL, centers, max_iters=None):
    """Multi-source shortest path; returns (distances, nearest_center_idx).

    ``centers``: array of node ids.  Edge weights = |G.vals| (the reference
    uses positive weights; ``graph.py:129``).
    """
    n = G.shape[0]
    cols, mask = _neighbors(G)
    w = jnp.abs(G.vals)
    centers = jnp.asarray(centers, jnp.int32)
    dist = jnp.full((n,), _BIG, jnp.float64).at[centers].set(0.0)
    nearest = jnp.full((n,), -1, jnp.int32).at[centers].set(
        jnp.arange(centers.shape[0], dtype=jnp.int32))
    it = 0
    limit = max_iters if max_iters is not None else n + 1
    while it < limit:
        nd, nn = _bf_round(cols, mask, w, dist, nearest)
        if bool(jnp.all(nd == dist)) and bool(jnp.all(nn == nearest)):
            break
        dist, nearest = nd, nn
        it += 1
    return dist, nearest


def breadth_first_search(G: ELL, seed_node: int):
    """BFS levels and order (reference ``graph.py:640``)."""
    n = G.shape[0]
    cols, mask = _neighbors(G)
    level = jnp.full((n,), -1, jnp.int32).at[seed_node].set(0)
    cur = 0
    while True:
        frontier = level == cur
        touch = jnp.any(frontier[cols] & mask, axis=1)
        newly = touch & (level < 0)
        if not bool(jnp.any(newly)):
            break
        level = jnp.where(newly, cur + 1, level)
        cur += 1
    order = np.argsort(np.asarray(level), kind="stable")
    return np.asarray(order), np.asarray(level)


def connected_components(G: ELL):
    """Component labels via min-label propagation (reference ``graph.py:698``)."""
    n = G.shape[0]
    cols, mask = _neighbors(G)
    label = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def step(label):
        nl = jnp.where(mask, label[cols], n)
        return jnp.minimum(label, jnp.min(nl, axis=1))

    while True:
        nl = step(label)
        if bool(jnp.all(nl == label)):
            break
        label = nl
    # compress to 0..k-1
    lab = np.asarray(label)
    _, inv = np.unique(lab, return_inverse=True)
    return inv.astype(np.int32)


def lloyd_cluster(G: ELL, centers, maxiter=5):
    """Lloyd clustering on a graph (reference ``graph.py:203-288``).

    centers: int (number of random seeds) or array of seed ids.
    Returns (clusters, centers): cluster index per node, final center ids.
    """
    n = G.shape[0]
    if np.isscalar(centers):
        nc = int(centers)
        rng = np.random.default_rng(0)
        centers = np.asarray(rng.choice(n, size=nc, replace=False))
    else:
        centers = np.asarray(centers)
        nc = len(centers)
    centers = jnp.asarray(centers, jnp.int32)
    clusters = None
    for _ in range(maxiter):
        dist, clusters = bellman_ford(G, centers)
        new_centers = most_interior_nodes(G, np.asarray(clusters), nc)
        new_centers = jnp.asarray(new_centers, jnp.int32)
        if bool(jnp.all(new_centers == centers)):
            centers = new_centers
            break
        centers = new_centers
    dist, clusters = bellman_ford(G, centers)
    return np.asarray(clusters), np.asarray(centers)


def kmeanspp_seed(G: ELL, nc, seed=0):
    """k-means++ style seeding on graph distances (reference
    ``graph.py:602``): pick each new center with probability proportional
    to distance^2 from the current centers."""
    n = G.shape[0]
    rng = np.random.default_rng(seed)
    centers = [int(rng.integers(n))]
    for _ in range(nc - 1):
        d, _ = bellman_ford(G, np.asarray(centers))
        d = np.array(d)
        d[~np.isfinite(d)] = d[np.isfinite(d)].max() + 1 if \
            np.isfinite(d).any() else 1.0
        p = d ** 2
        s = p.sum()
        if s == 0:
            remaining = np.setdiff1d(np.arange(n), centers)
            centers.append(int(rng.choice(remaining)))
            continue
        centers.append(int(rng.choice(n, p=p / s)))
    return np.asarray(centers)


@jax.jit
def _bf_balanced_round(cols, mask, w, dist, nearest, sizes):
    """One balanced BF round (reference ``graph.h:736``): accept strictly
    closer centers, or equal-distance centers of smaller clusters."""
    nd = jnp.where(mask, dist[cols] + w, _BIG)
    ncl = jnp.where(mask, nearest[cols], -1)
    nsz = jnp.where(ncl >= 0, sizes[jnp.maximum(ncl, 0)], n_max := 2 ** 30)
    # pick best neighbor offer: smallest (dist, cluster size) lexicographic
    key = nd * (2.0 ** 32) + nsz
    j = jnp.argmin(key, axis=1)
    best_d = jnp.take_along_axis(nd, j[:, None], axis=1)[:, 0]
    best_c = jnp.take_along_axis(ncl, j[:, None], axis=1)[:, 0]
    best_s = jnp.take_along_axis(nsz, j[:, None], axis=1)[:, 0]
    cur_s = jnp.where(nearest >= 0, sizes[jnp.maximum(nearest, 0)], 2 ** 30)
    better = (best_d < dist) | ((best_d == dist) & (best_c >= 0) &
                                (best_s + 1 < cur_s))
    new_dist = jnp.where(better, best_d, dist)
    new_near = jnp.where(better, best_c, nearest)
    return new_dist, new_near


def bellman_ford_balanced(G: ELL, centers, max_iters=None):
    """Balanced multi-source shortest paths (reference ``graph.py:129`` /
    ``graph.h:736``): distance ties break toward smaller clusters."""
    n = G.shape[0]
    cols, mask = _neighbors(G)
    w = jnp.abs(G.vals)
    centers = jnp.asarray(centers, jnp.int32)
    nc = centers.shape[0]
    dist = jnp.full((n,), _BIG, jnp.float64).at[centers].set(0.0)
    nearest = jnp.full((n,), -1, jnp.int32).at[centers].set(
        jnp.arange(nc, dtype=jnp.int32))
    limit = max_iters if max_iters is not None else 2 * n + 2
    it = 0
    while it < limit:
        sizes = jnp.zeros((nc,), jnp.int32).at[
            jnp.maximum(nearest, 0)].add((nearest >= 0).astype(jnp.int32))
        nd, nn = _bf_balanced_round(cols, mask, w, dist, nearest, sizes)
        if bool(jnp.all(nd == dist)) and bool(jnp.all(nn == nearest)):
            break
        dist, nearest = nd, nn
        it += 1
    return dist, nearest


def _cluster_floyd_warshall(G: ELL, clusters, nc, maxsize):
    """Per-cluster all-pairs shortest paths via batched dense
    Floyd-Warshall (reference ``graph.h:436``); clusters padded to
    ``maxsize``.  Returns (members (nc, m), D (nc, m, m))."""
    n = G.shape[0]
    cl = np.asarray(clusters)
    members = np.full((nc, maxsize), -1, np.int64)
    counts = np.zeros(nc, np.int64)
    for i in np.argsort(cl, kind="stable"):
        c = cl[i]
        if 0 <= c < nc and counts[c] < maxsize:
            members[c, counts[c]] = i
            counts[c] += 1
    mem = jnp.asarray(np.where(members < 0, 0, members))
    ok = jnp.asarray(members >= 0)
    m = maxsize
    # dense intra-cluster adjacency
    sub = ELL(G.cols[mem.reshape(-1)], jnp.abs(G.vals)[mem.reshape(-1)],
              G.row_nnz[mem.reshape(-1)], (nc * m, G.shape[1]))
    from pyamg_tpu.ops.rowops import row_lookup
    qc = jnp.broadcast_to(mem[:, None, :], (nc, m, m)).reshape(nc * m, m)
    Wd = row_lookup(sub, qc.astype(jnp.int32)).reshape(nc, m, m)
    D = jnp.where(Wd > 0, Wd, _BIG)
    eye = jnp.eye(m, dtype=bool)[None]
    D = jnp.where(eye, 0.0, D)
    okij = ok[:, :, None] & ok[:, None, :]
    D = jnp.where(okij | eye, D, _BIG)

    def fw_step(D, k):
        Dk = D[:, :, k][:, :, None] + D[:, k, :][:, None, :]
        return jnp.minimum(D, Dk), None

    D, _ = jax.lax.scan(fw_step, D, jnp.arange(m))
    return np.asarray(members), D


def center_nodes(G: ELL, clusters, nc, maxsize=None):
    """Graph-median center per cluster (reference ``graph.h:530``):
    the member minimizing the sum of intra-cluster distances."""
    n = G.shape[0]
    cl = np.asarray(clusters)
    sizes = np.bincount(cl[cl >= 0], minlength=nc)
    m = int(sizes.max()) if len(sizes) else 1
    if maxsize is not None:
        m = min(m, maxsize)
    members, D = _cluster_floyd_warshall(G, cl, nc, max(m, 1))
    ok = members >= 0
    Dn = np.array(D)
    Dn[~np.isfinite(Dn)] = 1e30
    rowsum = (Dn * ok[:, None, :]).sum(axis=2)
    rowsum[~ok] = np.inf
    best = rowsum.argmin(axis=1)
    centers = members[np.arange(nc), best]
    # clusters with no members keep a placeholder center 0
    centers = np.where(ok.any(axis=1), centers, 0)
    return centers


def balanced_lloyd_cluster(G: ELL, num_clusters, maxiter=5, rebalance_iters=0,
                           seed=0):
    """Balanced Lloyd clustering (reference ``graph.py:289-600``):
    balanced Bellman-Ford assignment + graph-median recentering."""
    n = G.shape[0]
    rng = np.random.default_rng(seed)
    centers = np.asarray(rng.choice(n, size=num_clusters, replace=False))
    clusters = None
    maxsize = 12 * int(np.ceil(n / num_clusters))
    for _ in range(maxiter):
        dist, clusters = bellman_ford_balanced(G, centers)
        if bool(jnp.any(jnp.asarray(clusters) < 0)):
            raise ValueError("Lloyd clustering failed to assign all nodes")
        new_centers = center_nodes(G, np.asarray(clusters), num_clusters,
                                   maxsize)
        if np.array_equal(new_centers, centers):
            break
        centers = new_centers
    dist, clusters = bellman_ford_balanced(G, centers)
    return np.asarray(clusters), np.asarray(centers)


def pseudo_peripheral_node(G: ELL):
    """Find a pseudo-peripheral node by repeated BFS (reference
    ``graph.py:789``)."""
    n = G.shape[0]
    u = 0
    last_ecc = -1
    while True:
        order, level = breadth_first_search(G, u)
        ecc = int(level.max())
        if ecc <= last_ecc:
            return u, order, level
        last_ecc = ecc
        frontier = np.where(level == ecc)[0]
        deg = np.asarray(jnp.sum(_neighbors(G)[1], axis=1))
        u = int(frontier[np.argmin(deg[frontier])])


def symmetric_rcm(A: ELL):
    """Reverse Cuthill-McKee ordering (reference ``graph.py:744``):
    BFS from a pseudo-peripheral node, within-level sort by degree,
    reversed.  Returns the permutation."""
    n = A.shape[0]
    _, mask = _neighbors(A)
    deg = np.asarray(jnp.sum(mask, axis=1))
    root, order, level = pseudo_peripheral_node(A)
    # stable sort by (level, degree)
    perm = np.lexsort((deg, level))
    # unreached nodes (level -1) go first in lexsort; push them to the end
    unreached = level[perm] < 0
    perm = np.concatenate([perm[~unreached], perm[unreached]])
    return perm[::-1].copy()


def metis_partition(G: ELL, nparts, seed=0):
    """Graph partitioning via pymetis if available (reference
    ``graph.py:839``); falls back to balanced Lloyd clustering."""
    try:
        import pymetis
    except ImportError:
        clusters, _ = balanced_lloyd_cluster(G, nparts, seed=seed)
        return clusters
    import scipy.sparse as sp
    from pyamg_tpu.sparse.matrix import to_scipy
    A = to_scipy(G).tocsr()
    A.setdiag(0)
    A.eliminate_zeros()
    adj = [A.indices[A.indptr[i]:A.indptr[i + 1]].tolist()
           for i in range(G.shape[0])]
    _, parts = pymetis.part_graph(nparts, adjacency=adj)
    return np.asarray(parts, np.int32)


def most_interior_nodes(G: ELL, clusters, nc):
    """Per cluster, the node farthest from the cluster boundary
    (reference ``graph.h:843``): BF from border nodes with edges restricted
    to same-cluster pairs, then segment-argmax."""
    n = G.shape[0]
    cols, mask = _neighbors(G)
    cl = jnp.asarray(clusters, jnp.int32)
    same = mask & (cl[cols] == cl[:, None])
    border = jnp.any(mask & (cl[cols] != cl[:, None]), axis=1)
    w = jnp.abs(G.vals)
    dist = jnp.where(border, 0.0, _BIG)

    @jax.jit
    def step(dist):
        nd = jnp.where(same, dist[cols] + w, _BIG)
        return jnp.minimum(dist, jnp.min(nd, axis=1))

    it = 0
    while it <= n:
        nd = step(dist)
        if bool(jnp.all(nd == dist)):
            break
        dist = nd
        it += 1
    # singleton clusters with no border (whole graph = one cluster) -> dist inf
    dist = jnp.where(jnp.isinf(dist), jnp.float64(n + 1), dist)
    # segment argmax: pick node with max dist per cluster (stable by id)
    d = np.asarray(dist)
    cl_np = np.asarray(cl)
    order = np.lexsort((np.arange(n), -d))   # sort by -dist then id
    seen = np.zeros(nc, bool)
    centers = np.zeros(nc, np.int64)
    for i in order:
        c = cl_np[i]
        if 0 <= c < nc and not seen[c]:
            seen[c] = True
            centers[c] = i
    return centers
