"""Round-2 fix coverage: vectorized recall, query micro-batching, angular
file normalization, graph-less sharded index, serve entry clamping."""

import json
import os

import numpy as np
import pytest

from gbnns_tpu.eval.recall import recall_at_k


def _recall_oracle(pred, gt, k):
    hits = 0
    for p_row, g_row in zip(np.asarray(pred)[:, :k], np.asarray(gt)[:, :k]):
        hits += len(np.intersect1d(p_row, g_row))
    return hits / (gt.shape[0] * k)


def test_recall_vectorized_matches_oracle():
    rng = np.random.default_rng(0)
    gt = np.stack([rng.choice(500, size=20, replace=False) for _ in range(64)])
    pred = np.stack([rng.choice(500, size=20, replace=False) for _ in range(64)])
    for k in (1, 5, 10, 20):
        assert recall_at_k(pred, gt, k) == pytest.approx(_recall_oracle(pred, gt, k))


def test_recall_handles_duplicates_and_sentinels():
    gt = np.array([[1, 2, 3, 4]])
    # duplicate hit must count once; -1 padding slots never match
    pred = np.array([[2, 2, -1, 9]])
    assert recall_at_k(pred, gt, 4) == pytest.approx(1 / 4)
    # all-sentinel row
    assert recall_at_k(np.array([[-1, -1, -1, -1]]), gt, 4) == 0.0
    # perfect row in permuted order
    assert recall_at_k(np.array([[4, 3, 2, 1]]), gt, 4) == 1.0


def test_recall_k1_exact_match_semantics():
    gt = np.array([[7, 1], [5, 2], [9, 3]])
    pred = np.array([[7, 0], [0, 5], [3, 9]])
    assert recall_at_k(pred, gt, 1) == pytest.approx(1 / 3)


def test_microbatch_equals_full_batch(fixture_data):
    from gbnns_tpu.pipeline import microbatch
    from gbnns_tpu.search.flat import FlatIndex

    base, query = fixture_data
    idx = FlatIndex(base)
    full_ids, full_d = idx.search(query, k=5, c=16)
    mb_ids, mb_d = microbatch(lambda q, ql: idx.search(q, ql, k=5, c=16),
                              (query, query), batch_size=50)  # non-divisor tail
    np.testing.assert_array_equal(np.asarray(full_ids), np.asarray(mb_ids))
    np.testing.assert_allclose(np.asarray(full_d), np.asarray(mb_d), rtol=1e-5)


def test_angular_files_are_normalized(tmp_path, monkeypatch):
    from gbnns_tpu.io.datasets import load_dataset
    from gbnns_tpu.io.vecs import write_fvecs

    rng = np.random.default_rng(3)
    base = rng.normal(size=(64, 16)).astype(np.float32) * 7.0
    query = rng.normal(size=(8, 16)).astype(np.float32) * 7.0
    root = tmp_path / "glove"
    root.mkdir()
    write_fvecs(str(root / "base.fvecs"), base)
    write_fvecs(str(root / "query.fvecs"), query)
    monkeypatch.setenv("GBNNS_DATA_DIR", str(tmp_path))
    ds = load_dataset("glove")
    assert ds.source == "files"
    np.testing.assert_allclose(np.linalg.norm(ds.base, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(ds.query, axis=1), 1.0, rtol=1e-5)


def test_sharded_index_without_graph(fixture_data):
    from gbnns_tpu.search.sharded import (build_sharded_index, make_mesh,
                                          sharded_search)

    base, query = fixture_data
    mesh = make_mesh(4)
    idx = build_sharded_index(base, 8, mesh, with_graph=False)
    assert idx.graph.shape[-1] == 0
    ids, dists = sharded_search(idx, query[:32], 5, ef=32, engine="flat")
    d2 = ((query[:32, None, :] - base[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :5]
    from gbnns_tpu.eval.recall import recall_at_k as r
    assert r(np.asarray(ids), gt, 5) > 0.99
    with pytest.raises(ValueError, match="with_graph"):
        sharded_search(idx, query[:32], 5, ef=32, engine="graph")


def test_serve_low_ef_graph_engine(fixture_data):
    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.serve import SearchService

    base, query = fixture_data
    graph = build_knn_graph(base, 8)
    svc = SearchService(base, graph=graph, engine="graph", ef=16)
    try:
        ids, dists = svc.submit(query[:4], None, k=5)
        assert np.asarray(ids).shape == (4, 5)
    finally:
        svc.stop()


def test_cli_sweep_n_devices(fixture_data, tmp_path):
    from gbnns_tpu import cli
    from gbnns_tpu.build.knn_graph import build_knn_graph, save_graph
    from gbnns_tpu.io.vecs import write_fvecs

    base, query = fixture_data
    write_fvecs(str(tmp_path / "base.fvecs"), base)
    write_fvecs(str(tmp_path / "query.fvecs"), query[:32])
    save_graph(str(tmp_path / "graph.npy"), build_knn_graph(base, 8))
    out = tmp_path / "sweep.json"
    cli.main(["sweep", "--base", str(tmp_path / "base.fvecs"),
              "--query", str(tmp_path / "query.fvecs"),
              "--graph", str(tmp_path / "graph.npy"),
              "--efs", "16", "--n-devices", "4", "--out", str(out)])
    rows = json.loads(out.read_text())
    assert rows[0]["extra"]["n_devices"] == 4
    assert rows[0]["qps"] > 0
