"""Graph-algorithm tests (reference ``pyamg/tests/test_graph.py`` idiom:
check fixed-point implementations against pure-Python references in
``graph_ref`` and against ``scipy.sparse.csgraph``)."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from pyamg_tpu.gallery import poisson, sprand
from pyamg_tpu.sparse.matrix import from_scipy, to_scipy
from pyamg_tpu import graph
from pyamg_tpu.graph_ref import bellman_ford_reference


def _dist_graph(n=40, seed=0):
    rng = np.random.default_rng(seed)
    S = to_scipy(poisson((n,))).tocoo()
    W = sp.coo_array((rng.uniform(0.5, 2.0, S.nnz), (S.row, S.col)),
                     shape=S.shape).tocsr()
    W = W.maximum(W.T)       # symmetric weights: push/pull relaxation agree
    return from_scipy(W)


def test_bellman_ford_vs_reference():
    A = _dist_graph(40, 1)
    centers = np.array([3, 25, 39])
    d, m = graph.bellman_ford(A, centers)[:2]
    d_ref, m_ref, _ = bellman_ford_reference(A, centers)
    np.testing.assert_allclose(np.asarray(d), d_ref)
    np.testing.assert_array_equal(np.asarray(m), m_ref)


def test_bellman_ford_vs_scipy_csgraph():
    A = _dist_graph(30, 2)
    centers = np.array([0, 17])
    d = np.asarray(graph.bellman_ford(A, centers)[0])
    D = csgraph.bellman_ford(to_scipy(A), indices=centers,
                             return_predecessors=False)
    np.testing.assert_allclose(d, D.min(axis=0))


def test_mis_is_maximal_independent():
    A = poisson((12, 12))
    flags = np.asarray(graph.maximal_independent_set(A))
    S = to_scipy(A).tocoo()
    sel = flags.astype(bool)
    for i, j in zip(S.row, S.col):
        if i != j:
            assert not (sel[i] and sel[j])          # independent
    # maximal: every unselected node has a selected neighbor
    Sl = to_scipy(A).tolil()
    for i in range(A.shape[0]):
        if not sel[i]:
            nbrs = [j for j in Sl.rows[i] if j != i]
            assert any(sel[j] for j in nbrs)


def test_vertex_coloring_methods():
    A = poisson((10, 10))
    S = to_scipy(A).tocoo()
    for method in ("JP", "MIS", "LDF"):
        c = np.asarray(graph.vertex_coloring(A, method=method))
        for i, j in zip(S.row, S.col):
            if i != j:
                assert c[i] != c[j]
        assert c.min() == 0


def test_connected_components_vs_scipy():
    S1 = to_scipy(poisson((7,)))
    Z = sp.csr_array((7, 7))
    S = sp.block_array([[S1, None], [None, S1 + Z]], format="csr")
    labels = np.asarray(graph.connected_components(from_scipy(S)))
    n_ref, lab_ref = csgraph.connected_components(S, directed=False)
    assert len(np.unique(labels)) == n_ref
    # same partition up to relabeling
    for v in np.unique(labels):
        assert len(np.unique(lab_ref[labels == v])) == 1


def test_breadth_first_search_levels():
    A = poisson((9,))   # path graph: BFS level = distance from seed
    order, level = graph.breadth_first_search(A, 0)
    np.testing.assert_array_equal(np.asarray(level), np.arange(9))


def test_lloyd_cluster_covers():
    A = _dist_graph(50, 3)
    clusters, centers = graph.lloyd_cluster(A, 5)[:2]
    clusters = np.asarray(clusters)
    assert (clusters >= 0).all()
    assert len(np.unique(clusters)) == 5


def test_pseudo_peripheral_node_on_path():
    A = poisson((15,))
    node = graph.pseudo_peripheral_node(A)[0]
    assert int(node) in (0, 14)


def test_symmetric_rcm_reduces_bandwidth():
    rng = np.random.default_rng(4)
    S = to_scipy(sprand(60, 60, 0.05, seed=4))
    S = (S + S.T).tocsr()
    S.setdiag(1.0)
    perm = np.asarray(graph.symmetric_rcm(from_scipy(S)))
    assert sorted(perm) == list(range(60))
    B = S[perm][:, perm].tocoo()
    bw_new = np.abs(B.row - B.col).max()
    coo0 = S.tocoo()
    bw_old = np.abs(coo0.row - coo0.col).max()
    assert bw_new <= bw_old
