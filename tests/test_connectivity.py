import numpy as np

from gbnns_tpu.build.knn_graph import (
    build_knn_graph, connected_components, ensure_connected,
    forward_reachable,
)
from gbnns_tpu.search.walker_jax import default_entry_ids


def _np_components(graph):
    """Host union-find oracle for weak connectivity."""
    n = graph.shape[0]
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for u in range(n):
        for v in graph[u]:
            if v >= 0:
                ra, rb = find(u), find(int(v))
                if ra != rb:
                    parent[rb] = ra
    return np.array([find(u) for u in range(n)])


def test_connected_components_matches_union_find():
    rng = np.random.default_rng(0)
    # two deliberate islands: edges only within [0,50) and [50,100)
    g = np.zeros((100, 3), dtype=np.int32)
    g[:50] = rng.integers(0, 50, size=(50, 3))
    g[50:] = rng.integers(50, 100, size=(50, 3))
    got = connected_components(g)
    ref = _np_components(g)
    # same partition (label values may differ)
    for comp in np.unique(ref):
        members = np.flatnonzero(ref == comp)
        assert len(np.unique(got[members])) == 1
    assert len(np.unique(got)) == len(np.unique(ref))


def test_ensure_connected_bridges_clusters(fixture_data):
    base, _ = fixture_data
    g = build_knn_graph(base, 8, chunk=1024, node_chunk=1024, connect=False)
    entries = np.asarray(default_entry_ids(base.shape[0]))
    assert not forward_reachable(g, entries).all()  # fixture data fragments
    labels_before = connected_components(g)
    g2 = ensure_connected(base, g)
    assert g2.shape == g.shape  # equal index memory
    # the walker's guarantee: every node directed-reachable from entries
    assert forward_reachable(g2, entries).all()
    # bridging should touch a tiny fraction of edges (directed repair needs
    # more bridges than weak components — many one-way pockets)
    changed = (g != g2).sum()
    assert changed <= 0.02 * g.size, (changed, g.size)
    assert len(np.unique(labels_before)) >= 1  # labels well-formed


def test_build_default_is_reachable(fixture_data):
    base, _ = fixture_data
    g = build_knn_graph(base, 8, chunk=1024, node_chunk=1024)
    entries = np.asarray(default_entry_ids(base.shape[0]))
    assert forward_reachable(g, entries).all()
