"""Parity + unit tests for the Pallas DMA-gather walker (walker_pallas.py).

Runs on the forced-CPU backend via the Mosaic interpreter, so the exact
program the TPU executes is what's tested (SURVEY §7.4: walker parity gate
between the pure-JAX reference and the fused variant)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gbnns_tpu.build.knn_graph import build_knn_graph
from gbnns_tpu.kernels.gather_pallas import dma_row_gather
from gbnns_tpu.search.rerank import rerank
from gbnns_tpu.search.walker_jax import beam_search, default_entry_ids
from gbnns_tpu.search.walker_pallas import (HopPayload, beam_search_pallas,
                                            pack_hop_payload)
from gbnns_tpu.eval.recall import recall_at_k


def test_dma_row_gather_matches_take():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((64, 8, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 64, size=37).astype(np.int32))
    out = dma_row_gather(src, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(src)[np.asarray(idx)])


def test_dma_row_gather_rejects_misaligned():
    with pytest.raises(ValueError):
        dma_row_gather(jnp.zeros((4, 7, 128), jnp.float32),
                       jnp.zeros((2,), jnp.int32), interpret=True)


def test_pack_payload_roundtrip_f32():
    rng = np.random.default_rng(1)
    base = rng.standard_normal((100, 16)).astype(np.float32)
    graph = rng.integers(0, 100, size=(100, 8)).astype(np.int32)
    p = pack_hop_payload(graph, base, vec_dtype="float32", node_chunk=33)
    assert p.words % 1024 == 0 and p.K == 8 and p.d == 16
    from gbnns_tpu.search.walker_pallas import _decode
    raw = jnp.asarray(p.data)[jnp.asarray([3, 77])]
    vecs, sq, ids = _decode(raw, K=8, d=16, vec_words=p.vec_words,
                            bf16=False)
    np.testing.assert_array_equal(np.asarray(ids), graph[[3, 77]])
    np.testing.assert_allclose(np.asarray(vecs), base[graph[[3, 77]]],
                               rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(sq), (base[graph[[3, 77]]] ** 2).sum(-1), rtol=1e-5)


def test_pack_payload_roundtrip_bf16():
    rng = np.random.default_rng(2)
    base = rng.standard_normal((64, 8)).astype(np.float32)
    graph = rng.integers(0, 64, size=(64, 4)).astype(np.int32)
    p = pack_hop_payload(graph, base, vec_dtype="bfloat16")
    from gbnns_tpu.search.walker_pallas import _decode
    raw = jnp.asarray(p.data)[jnp.asarray([5])]
    vecs, sq, ids = _decode(raw, K=4, d=8, vec_words=p.vec_words, bf16=True)
    np.testing.assert_array_equal(np.asarray(ids), graph[[5]])
    # bf16 storage rounding: 2^-8 relative
    np.testing.assert_allclose(np.asarray(vecs), base[graph[[5]]],
                               rtol=1.5 / 256)


@pytest.fixture(scope="module")
def small_index(request):
    rng = np.random.default_rng(3)
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    data = make_synthetic(SyntheticSpec(n_base=2048, n_query=64, dim=24,
                                        n_clusters=16, seed=11))
    base, query = data["base"], data["query"]
    graph = build_knn_graph(base, 12, chunk=1024, node_chunk=1024)
    return base, query, graph


def test_walker_pallas_parity_with_jax(small_index):
    """Bit-identical pool vs walker_jax (beam mode) on the f32 payload —
    the SURVEY §7.4 parity gate."""
    base, query, graph = small_index
    entries = default_entry_ids(base.shape[0], 8)
    ref = beam_search(jnp.asarray(query), jnp.asarray(base),
                      jnp.asarray(graph), entries, ef=24, max_hops=48)
    payload = pack_hop_payload(graph, base, vec_dtype="float32")
    got = beam_search_pallas(query, payload, base, entries, ef=24,
                             max_hops=48)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(ref.ids))
    np.testing.assert_allclose(np.asarray(got.dists), np.asarray(ref.dists),
                               rtol=1e-6)
    assert int(got.hops) == int(ref.hops)
    np.testing.assert_array_equal(np.asarray(got.n_dist),
                                  np.asarray(ref.n_dist))


def test_walker_pallas_bf16_recall(small_index):
    """bf16 payload storage must not cost end recall after re-rank."""
    base, query, graph = small_index
    entries = default_entry_ids(base.shape[0], 8)
    payload = pack_hop_payload(graph, base, vec_dtype="bfloat16")
    res = beam_search_pallas(query, payload, base, entries, ef=32,
                             max_hops=64)
    ids, _ = rerank(jnp.asarray(query), jnp.asarray(base), res.ids, 10)
    d2 = ((query[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :10].astype(np.int32)
    assert recall_at_k(np.asarray(ids), gt, 10) >= 0.9


def test_walker_pallas_metrics(small_index):
    """ip/angular run and agree with walker_jax."""
    base, query, graph = small_index
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = query / np.linalg.norm(query, axis=1, keepdims=True)
    entries = default_entry_ids(base.shape[0], 8)
    payload = pack_hop_payload(graph, bn, vec_dtype="float32")
    ref = beam_search(jnp.asarray(qn), jnp.asarray(bn), jnp.asarray(graph),
                      entries, ef=16, max_hops=32, metric="angular")
    got = beam_search_pallas(qn, payload, bn, entries, ef=16, max_hops=32,
                             metric="angular")
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(ref.ids))


def test_centroid_entries_save_load(tmp_path):
    """Staged quantizer artifact: load == build (bit-identical arrays)."""
    import numpy as np
    from gbnns_tpu.search.entries import CentroidEntries

    rng = np.random.default_rng(3)
    lo = rng.standard_normal((512, 8)).astype(np.float32)
    ce = CentroidEntries.build(lo, ncent=16, iters=2)
    p = str(tmp_path / "cent.npz")
    ce.save(p)
    ce2 = CentroidEntries.load(p)
    assert ce2.metric == ce.metric
    np.testing.assert_array_equal(np.asarray(ce2.node_ids),
                                  np.asarray(ce.node_ids))
    np.testing.assert_allclose(np.asarray(ce2.centroids),
                               np.asarray(ce.centroids))
    q = rng.standard_normal((32, 8)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(ce.query_entries(q, 4)),
                                  np.asarray(ce2.query_entries(q, 4)))


def test_walker_pallas_exact_visited_parity(small_index):
    """visited_mode='exact' (VERDICT r3 weak 7): the payload walker with an
    exact visited table and expand=1 must be BIT-IDENTICAL to
    walker_jax(visited_mode='exact', expand=1) — the engine the C++ oracle
    gates — including the dist-comp counters the reference metric uses."""
    base, query, graph = small_index
    entries = default_entry_ids(base.shape[0], 8)
    ref = beam_search(jnp.asarray(query), jnp.asarray(base),
                      jnp.asarray(graph), entries, ef=24, max_hops=96,
                      visited_mode="exact", expand=1)
    payload = pack_hop_payload(graph, base, vec_dtype="float32")
    got = beam_search_pallas(query, payload, base, entries, ef=24,
                             max_hops=96, visited_mode="exact", expand=1)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(ref.ids))
    np.testing.assert_allclose(np.asarray(got.dists), np.asarray(ref.dists),
                               rtol=1e-6)
    assert int(got.hops) == int(ref.hops)
    np.testing.assert_array_equal(np.asarray(got.n_dist),
                                  np.asarray(ref.n_dist))


def test_walker_pallas_exact_visited_multi_expand(small_index):
    """exact mode with expand=4: still bit-identical to the jax walker at
    the same knobs (the visited table is engine-independent state)."""
    base, query, graph = small_index
    entries = default_entry_ids(base.shape[0], 8)
    ref = beam_search(jnp.asarray(query), jnp.asarray(base),
                      jnp.asarray(graph), entries, ef=24, max_hops=48,
                      visited_mode="exact", expand=4)
    payload = pack_hop_payload(graph, base, vec_dtype="float32")
    got = beam_search_pallas(query, payload, base, entries, ef=24,
                             max_hops=48, visited_mode="exact", expand=4)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(ref.ids))
    np.testing.assert_array_equal(np.asarray(got.n_dist),
                                  np.asarray(ref.n_dist))
