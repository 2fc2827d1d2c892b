"""Recall-parity gate: the TPU walkers vs the C++/OpenMP reference engine at
equal index memory (same graph, same ef) — BASELINE.json:5."""

import jax.numpy as jnp
import numpy as np
import pytest

from gbnns_tpu import native
from gbnns_tpu.build.knn_graph import build_knn_graph
from gbnns_tpu.eval.recall import recall_at_k
from gbnns_tpu.search.rerank import rerank
from gbnns_tpu.search.walker_jax import beam_search, default_entry_ids

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def graph_np(fixture_data):
    base, _ = fixture_data
    # reverse_frac=0: the C++ oracle models the reference's pure-kNN graph
    return build_knn_graph(base, 16, chunk=1024, node_chunk=1024,
                           reverse_frac=0.0)


def test_native_knn_build_matches_tpu(fixture_data):
    base, _ = fixture_data
    g_native = native.knn_build(base[:256], 8)
    g_tpu = build_knn_graph(base[:256], 8, chunk=1024, node_chunk=256,
                            connect=False, reverse_frac=0.0)
    # id-level agreement up to fp ties: compare via true distances
    d2 = ((base[:256, None, :] - base[None, :256, :]) ** 2).sum(-1)
    dn = np.take_along_axis(d2, g_native, axis=1)
    dt = np.take_along_axis(d2, g_tpu, axis=1)
    np.testing.assert_allclose(np.sort(dt, 1), np.sort(dn, 1),
                               rtol=1e-3, atol=1e-3)


def test_walker_recall_parity_with_cpp(fixture_data, fixture_gt, graph_np):
    """Same graph, same ef, same entries: the TPU lockstep walker must reach
    recall within 2 points of the C++ exact-visited searcher."""
    base, query = fixture_data
    entries = np.asarray(default_entry_ids(base.shape[0], 16))
    for ef in (16, 64):
        c_ids, c_dists, c_nd = native.beam_search(base, graph_np, query,
                                                  entries, ef=ef)
        c_top, _ = native.rerank(base, query, c_ids, 10)
        r_cpp = recall_at_k(c_top, fixture_gt, 10)

        res = beam_search(jnp.asarray(query), jnp.asarray(base),
                          jnp.asarray(graph_np), jnp.asarray(entries), ef=ef)
        t_ids, _ = rerank(jnp.asarray(query), jnp.asarray(base), res.ids, 10)
        r_tpu = recall_at_k(np.asarray(t_ids), fixture_gt, 10)
        assert r_tpu >= r_cpp - 0.02, (ef, r_tpu, r_cpp)


def test_exact_visited_mode_matches_cpp_pool(fixture_data, graph_np):
    """visited_mode='exact' reproduces the reference's candidate semantics:
    identical pools on identical inputs (up to fp tie ordering)."""
    base, query = fixture_data
    entries = np.asarray(default_entry_ids(base.shape[0], 16))
    ef = 32
    c_ids, c_dists, _ = native.beam_search(base, graph_np, query[:32],
                                           entries, ef=ef)
    # expand=1 reproduces the reference's one-pop-per-iteration order
    res = beam_search(jnp.asarray(query[:32]), jnp.asarray(base),
                      jnp.asarray(graph_np), jnp.asarray(entries), ef=ef,
                      visited_mode="exact", expand=1)
    t_ids = np.asarray(res.ids)
    # compare as sets per query (expansion order can differ on fp ties)
    agree = np.mean([
        len(np.intersect1d(a[a >= 0], b[b >= 0])) / max((a >= 0).sum(), 1)
        for a, b in zip(c_ids, t_ids)
    ])
    assert agree >= 0.9, agree


def test_native_ndist_reported(fixture_data, graph_np):
    base, query = fixture_data
    entries = np.asarray(default_entry_ids(base.shape[0], 16))
    _, _, nd = native.beam_search(base, graph_np, query[:8], entries, ef=16)
    assert (nd > 16).all()
