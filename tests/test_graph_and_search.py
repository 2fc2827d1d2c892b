import jax.numpy as jnp
import numpy as np
import pytest

from gbnns_tpu.build.knn_graph import build_knn_graph, load_graph, save_graph
from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
from gbnns_tpu.search.rerank import rerank
from gbnns_tpu.search.walker_jax import beam_search, default_entry_ids


@pytest.fixture(scope="module")
def graph16(fixture_data):
    base, _ = fixture_data
    return build_knn_graph(base, 16, chunk=1024, node_chunk=1024)


def test_graph_shape_no_self(fixture_data, graph16):
    base, _ = fixture_data
    n = base.shape[0]
    assert graph16.shape == (n, 16)
    assert graph16.dtype == np.int32
    self_ids = np.arange(n)[:, None]
    assert not (graph16 == self_ids).any()
    assert (graph16 >= 0).all() and (graph16 < n).all()


def test_graph_matches_numpy_oracle(fixture_data):
    base, _ = fixture_data
    # connect=False, reverse_frac=0: bridge/reverse edges intentionally
    # deviate from true kNN
    graph16 = build_knn_graph(base, 16, chunk=1024, node_chunk=1024,
                              connect=False, reverse_frac=0.0)
    d2 = ((base[:50, None, :] - base[None, :, :]) ** 2).sum(-1)
    ref = np.argsort(d2, axis=1, kind="stable")[:, 1:17]
    # The MXU kernel uses the ‖x‖²−2x·y+‖y‖² expansion in f32, so near-ties
    # may resolve differently than the numpy oracle; require the chosen
    # neighbors to be no worse than the true kNN within fp tolerance and the
    # neighbor sets to agree almost everywhere.
    got_d = np.sort(np.take_along_axis(d2, graph16[:50], axis=1), axis=1)
    ref_d = np.sort(np.take_along_axis(d2, ref, axis=1), axis=1)
    assert (got_d <= ref_d * 1.01 + 1e-3).all()
    overlap = np.mean([len(np.intersect1d(a, b)) for a, b in zip(graph16[:50], ref)])
    assert overlap >= 15.5, overlap


def test_graph_roundtrip(tmp_path, graph16):
    p = str(tmp_path / "g.npy")
    save_graph(p, graph16)
    np.testing.assert_array_equal(load_graph(p), graph16)


def test_ground_truth_matches_oracle(fixture_data, fixture_gt):
    base, query = fixture_data
    gt = exact_ground_truth(query, base, k=10, chunk=512)
    d2 = ((query[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    got_d = np.take_along_axis(d2, gt, axis=1)
    ref_d = np.take_along_axis(d2, fixture_gt[:, :10], axis=1)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("visited_mode", ["beam", "exact"])
def test_beam_search_high_recall(fixture_data, fixture_gt, graph16, visited_mode):
    base, query = fixture_data
    res = beam_search(jnp.asarray(query), jnp.asarray(base), jnp.asarray(graph16),
                      default_entry_ids(base.shape[0], 16), ef=64,
                      visited_mode=visited_mode)
    ids, dists = rerank(jnp.asarray(query), jnp.asarray(base), res.ids, 10)
    r1 = recall_at_k(np.asarray(ids), fixture_gt, 1)
    r10 = recall_at_k(np.asarray(ids), fixture_gt, 10)
    assert r1 >= 0.95, r1
    assert r10 >= 0.9, r10
    assert int(res.hops) > 1
    assert (np.asarray(res.n_dist) > 0).all()


def test_beam_search_ef_monotone_recall(fixture_data, fixture_gt, graph16):
    base, query = fixture_data
    recalls = []
    for ef in (4, 16, 64):
        res = beam_search(jnp.asarray(query), jnp.asarray(base),
                          jnp.asarray(graph16),
                          default_entry_ids(base.shape[0], min(ef, 16)), ef=ef)
        ids, _ = rerank(jnp.asarray(query), jnp.asarray(base), res.ids, 1)
        recalls.append(recall_at_k(np.asarray(ids), fixture_gt, 1))
    assert recalls[0] <= recalls[1] + 0.05
    assert recalls[1] <= recalls[2] + 0.05
    assert recalls[-1] >= 0.9


def test_beam_search_deterministic(fixture_data, graph16):
    base, query = fixture_data
    args = (jnp.asarray(query), jnp.asarray(base), jnp.asarray(graph16),
            default_entry_ids(base.shape[0], 16))
    a = beam_search(*args, ef=32)
    b = beam_search(*args, ef=32)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.n_dist), np.asarray(b.n_dist))


def test_beam_search_results_sorted(fixture_data, graph16):
    base, query = fixture_data
    res = beam_search(jnp.asarray(query[:16]), jnp.asarray(base),
                      jnp.asarray(graph16), default_entry_ids(base.shape[0], 16),
                      ef=32)
    d = np.asarray(res.dists)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    ids = np.asarray(res.ids)
    # no duplicate ids within a row (excluding -1 padding)
    for row in ids:
        row = row[row >= 0]
        assert len(row) == len(np.unique(row))


def test_exact_visited_ef_n_is_exhaustive(fixture_data):
    """SURVEY §7.4 property: ef = n turns the exact-visited walk into an
    exhaustive search — on a reachability-repaired graph it must return
    the true top-k (recall 1.0), because the pool can hold every node and
    the walk only stops when no unexpanded candidate remains."""
    base, query = fixture_data
    base, query = base[:256], query[:64]
    n = base.shape[0]
    graph = build_knn_graph(base, 8, chunk=1024, node_chunk=256)
    # the connectivity repair guarantees directed reachability from the
    # DEFAULT 32-entry set — exhaustiveness holds from that set
    res = beam_search(jnp.asarray(query), jnp.asarray(base),
                      jnp.asarray(graph), default_entry_ids(n),
                      ef=n, max_hops=2 * n, visited_mode="exact", expand=1)
    ids, _ = rerank(jnp.asarray(query), jnp.asarray(base), res.ids, 10)
    d2 = ((query[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :10].astype(np.int32)
    r10 = recall_at_k(np.asarray(ids), gt, 10)
    assert r10 == 1.0, r10
    # and the walk really did visit everything reachable
    assert (np.asarray(res.n_dist) >= n - 32).all()


def test_pca_orthonormal_and_isometric():
    """SURVEY §7.4 property: PCA components are orthonormal; at full rank
    the transform is a centered rotation (pairwise distances preserved),
    and at reduced rank projected distances never exceed the originals."""
    from gbnns_tpu.dimred.pca import pca_fit, pca_transform

    rng = np.random.default_rng(3)
    x = rng.standard_normal((512, 24)).astype(np.float32) * \
        np.linspace(3.0, 0.1, 24, dtype=np.float32)
    m_full = pca_fit(x, 24)
    c = m_full.components                       # (d, d_out)
    np.testing.assert_allclose(c.T @ c, np.eye(24), atol=1e-4)
    y = pca_transform(m_full, x)
    dx = ((x[:64, None] - x[None, :64]) ** 2).sum(-1)
    dy = ((y[:64, None] - y[None, :64]) ** 2).sum(-1)
    np.testing.assert_allclose(dy, dx, rtol=2e-3, atol=2e-3)
    # reduced rank: orthonormal columns; projection contracts distances
    m8 = pca_fit(x, 8)
    c8 = m8.components
    np.testing.assert_allclose(c8.T @ c8, np.eye(8), atol=1e-4)
    y8 = pca_transform(m8, x)
    d8 = ((y8[:64, None] - y8[None, :64]) ** 2).sum(-1)
    assert (d8 <= dx * (1 + 2e-3) + 2e-3).all()
    # and the energy kept is the top-eigenvalue mass (variance ordering)
    assert (np.diff(m8.explained_variance) <= 1e-5).all()


def test_rerank_excludes_invalid_and_dups():
    base = np.array([[0.0], [1.0], [2.0], [3.0]], dtype=np.float32)
    q = np.array([[0.9]], dtype=np.float32)
    cand = np.array([[1, 1, -1, 3]], dtype=np.int32)
    ids, dists = rerank(jnp.asarray(q), jnp.asarray(base), jnp.asarray(cand), 2)
    assert np.asarray(ids)[0, 0] == 1
    assert np.asarray(ids)[0, 1] == 3  # duplicate of 1 must not fill slot 2


def test_per_query_centroid_entries(fixture_data, fixture_gt):
    """(B, E) entry ids (entries.CentroidEntries) seed the walk per query
    and must not lose recall vs shared strided entries."""
    import jax.numpy as jnp
    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.search.entries import CentroidEntries
    from gbnns_tpu.search.rerank import rerank
    from gbnns_tpu.search.walker_jax import beam_search
    from gbnns_tpu.eval.recall import recall_at_k

    base, query = fixture_data
    graph = build_knn_graph(base, 8, chunk=1024, node_chunk=1024)
    ce = CentroidEntries.build(base, ncent=64, seed=0)
    ent = ce.query_entries(query, 8)
    assert ent.shape == (query.shape[0], 8)
    res = beam_search(jnp.asarray(query), jnp.asarray(base),
                      jnp.asarray(graph), ent, ef=32, max_hops=64)
    ids, _ = rerank(jnp.asarray(query), jnp.asarray(base), res.ids, 10)
    r10 = recall_at_k(np.asarray(ids), fixture_gt, 10)
    assert r10 > 0.9

    # pallas walker accepts the same per-query entries
    from gbnns_tpu.search.walker_pallas import (beam_search_pallas,
                                                pack_hop_payload)
    payload = pack_hop_payload(graph, base, vec_dtype="float32")
    res2 = beam_search_pallas(query, payload, base, ent, ef=32, max_hops=64)
    np.testing.assert_array_equal(np.asarray(res2.ids), np.asarray(res.ids))


def test_graph_index_end_to_end(fixture_data, fixture_gt):
    """GraphIndex: graph + DMA payload + centroid entries + re-rank."""
    from gbnns_tpu.search.graph_index import GraphIndex
    from gbnns_tpu.eval.recall import recall_at_k

    base, query = fixture_data
    idx = GraphIndex.build(base, K=8, ncent=64,
                           build_kwargs=dict(chunk=1024, node_chunk=1024))
    ids, dists = idx.search(query, k=10, ef=32, num_entries=8, max_hops=64)
    assert recall_at_k(np.asarray(ids), fixture_gt, 10) > 0.9
    d = np.asarray(dists)
    assert (np.diff(d, axis=1) >= -1e-5).all()

    # no-centroid fallback
    idx2 = GraphIndex.build(base, K=8, ncent=None, graph=idx.graph)
    ids2, _ = idx2.search(query, k=10, ef=32, max_hops=64)
    assert recall_at_k(np.asarray(ids2), fixture_gt, 10) > 0.85


@pytest.mark.slow  # ~150 s: interpret-mode binned-scan graph build
def test_fused_backend_graph_build(fixture_data, fixture_gt):
    """backend='fused' (binned Pallas scan) builds a near-exact graph that
    the walker searches at full recall."""
    import jax.numpy as jnp
    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.search.rerank import rerank
    from gbnns_tpu.search.walker_jax import beam_search, default_entry_ids
    from gbnns_tpu.eval.recall import recall_at_k

    base, query = fixture_data
    g_exact = build_knn_graph(base, 8, chunk=1024, node_chunk=1024)
    g_fused = build_knn_graph(base, 8, backend="fused", node_chunk=1024)
    assert g_fused.shape == g_exact.shape
    # per-node edge overlap with the exact graph (bin collisions lose a
    # little; symmetrization/repair shuffles rows, so compare as sets)
    overlap = np.mean([
        len(np.intersect1d(g_fused[i], g_exact[i])) / g_exact.shape[1]
        for i in range(0, 2048, 64)])
    assert overlap > 0.6

    entries = default_entry_ids(base.shape[0], 16)
    res = beam_search(jnp.asarray(query), jnp.asarray(base),
                      jnp.asarray(g_fused), entries, ef=32, max_hops=64)
    ids, _ = rerank(jnp.asarray(query), jnp.asarray(base), res.ids, 10)
    assert recall_at_k(np.asarray(ids), fixture_gt, 10) > 0.9


def test_graph_index_hbm_budget_guard(fixture_data):
    """hbm_budget fails fast (before the graph build) with a sizing
    breakdown when the payload + corpora estimate exceeds it — the
    GIST-shaped 1M x d'=128 OOM, caught in seconds instead of after an
    800 s build (see contract_scale.py)."""
    import pytest
    from gbnns_tpu.search.graph_index import GraphIndex

    base, _ = fixture_data
    with pytest.raises(MemoryError, match="sharded engine"):
        GraphIndex.build(base, K=8, ncent=None, hbm_budget=1024.0,
                         build_kwargs=dict(chunk=1024))
    # generous budget builds fine and reports its estimate
    idx = GraphIndex.build(base, K=8, ncent=None, hbm_budget=64e9,
                           build_kwargs=dict(chunk=1024, node_chunk=1024))
    assert 0 < idx.stats["payload_bytes"] < idx.stats["est_hbm_bytes"]


def test_build_backend_pallas_demoted(fixture_data):
    """The round-4 demotion (results/build_backend_ab.json): the config
    surface rejects backend='pallas' with a pointer to the measurement
    and the direct-kernel escape hatch."""
    import pytest
    from gbnns_tpu.build.knn_graph import build_knn_graph

    base, _ = fixture_data
    with pytest.raises(ValueError, match="demoted in round 4"):
        build_knn_graph(base[:256], 4, backend="pallas")
