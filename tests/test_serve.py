"""Drive the HTTP serving surface end-to-end (stdlib client, CPU backend)."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from gbnns_tpu.serve import SearchService, make_handler


@pytest.fixture(scope="module")
def server(fixture_data):
    base, _ = fixture_data
    svc = SearchService(base, max_wait_ms=1.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", svc
    httpd.shutdown()
    svc.stop()


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_healthz(server):
    url, _ = server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        obj = json.loads(r.read())
    assert obj["status"] == "ok"
    assert obj["n"] == 2048


def test_search_roundtrip(server, fixture_data, fixture_gt):
    url, _ = server
    base, query = fixture_data
    resp = _post(url + "/search", {"queries": query[:4].tolist(), "k": 5})
    ids = np.asarray(resp["ids"])
    assert ids.shape == (4, 5)
    # exact flat scan on raw vectors: top-1 must match GT
    assert (ids[:, 0] == fixture_gt[:4, 0]).mean() >= 0.75
    assert resp["took_ms"] > 0


def test_concurrent_requests_microbatch(server, fixture_data, fixture_gt):
    url, _ = server
    base, query = fixture_data
    results = {}

    def call(i):
        results[i] = _post(url + "/search",
                           {"queries": [query[i].tolist()], "k": 3})

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8
    hits = sum(results[i]["ids"][0][0] == int(fixture_gt[i, 0])
               for i in range(8))
    assert hits >= 6


def test_search_raw_roundtrip(server, fixture_data, fixture_gt):
    """Raw binary protocol over a persistent HTTP/1.1 connection."""
    import http.client

    from gbnns_tpu.serve import pack_raw_request, unpack_raw_response

    url, _ = server
    base, query = fixture_data
    host, port = url.split("//")[1].split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=60)
    try:
        for rep in range(3):  # 3 requests on ONE connection (keep-alive)
            body = pack_raw_request(query[:4], 5)
            conn.request("POST", "/search_raw", body=body,
                         headers={"Content-Type":
                                  "application/octet-stream"})
            r = conn.getresponse()
            assert r.status == 200
            ids, dists = unpack_raw_response(r.read())
            assert ids.shape == (4, 5) and dists.shape == (4, 5)
            assert (ids[:, 0] == fixture_gt[:4, 0]).mean() >= 0.75
            assert (np.diff(dists, axis=1) >= -1e-5).all()
    finally:
        conn.close()


def test_search_raw_rejects_bad_bodies(server, fixture_data):
    url, _ = server
    base, query = fixture_data
    from gbnns_tpu.serve import pack_raw_request

    def raw_post(body):
        req = urllib.request.Request(
            url + "/search_raw", data=body,
            headers={"Content-Type": "application/octet-stream"})
        return urllib.request.urlopen(req, timeout=30)

    for bad in (b"short", b"\x00" * 64,
                pack_raw_request(query[:2, :7], 5)):   # wrong dim
        with pytest.raises(urllib.error.HTTPError) as exc:
            raw_post(bad)
        assert exc.value.code == 400


def test_empty_batch_rejected(server):
    url, _ = server
    req = urllib.request.Request(url + "/search",
                                 data=b'{"queries": [], "k": 3}',
                                 headers={"Content-Type":
                                          "application/json"})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_bad_request_returns_400(server):
    url, _ = server
    req = urllib.request.Request(url + "/search", data=b'{"queries": "nope"}',
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_unknown_route_404(server):
    url, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(url + "/nope", timeout=30)
    assert exc.value.code == 404


def test_graph_engine_service(fixture_data, fixture_gt):
    from gbnns_tpu.build.knn_graph import build_knn_graph

    base, query = fixture_data
    g = build_knn_graph(base, 8, chunk=1024, node_chunk=1024)
    svc = SearchService(base, graph=g, engine="graph", ef=32, max_wait_ms=1.0)
    try:
        ids, dists = svc.submit(query[:8], None, 5)
        assert ids.shape == (8, 5)
        hits = (ids[:, 0] == fixture_gt[:8, 0]).mean()
        assert hits >= 0.7, hits
    finally:
        svc.stop()


def test_serve_graph_pallas_engine(fixture_data, fixture_gt):
    """graph_pallas engine: DMA-payload walker behind the HTTP service."""
    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.serve import SearchService
    from gbnns_tpu.eval.recall import recall_at_k

    base, query = fixture_data
    graph = build_knn_graph(base, 8, chunk=1024, node_chunk=1024)
    svc = SearchService(base, graph=graph, engine="graph_pallas", ef=32)
    try:
        ids, dists = svc.submit(query[:32], None, 10)
        assert ids.shape == (32, 10)
        r10 = recall_at_k(np.asarray(ids), fixture_gt[:32], 10)
        assert r10 > 0.85
    finally:
        svc.stop()


def test_serve_graph_pallas_staged_centroids(fixture_data, fixture_gt,
                                             tmp_path):
    """--centroids artifact: the service loads the staged quantizer
    instead of refitting k-means (compile-bound ~100 s/process on TPU)."""
    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.search.entries import CentroidEntries
    from gbnns_tpu.serve import SearchService
    from gbnns_tpu.eval.recall import recall_at_k

    base, query = fixture_data
    graph = build_knn_graph(base, 8, chunk=1024, node_chunk=1024)
    ce = CentroidEntries.build(base, ncent=16, iters=2)
    p = str(tmp_path / "cent.npz")
    ce.save(p)
    svc = SearchService(base, graph=graph, engine="graph_pallas", ef=32,
                        centroids_path=p)
    try:
        ids, _ = svc.submit(query[:32], None, 10)
        r10 = recall_at_k(np.asarray(ids), fixture_gt[:32], 10)
        assert r10 > 0.85
    finally:
        svc.stop()


@pytest.mark.slow  # ~20 s; the service path is covered fast by the graph_pallas engine test
def test_serve_fused_engine(fixture_data, fixture_gt):
    """fused engine (the headline binned-scan path) behind the service."""
    from gbnns_tpu.serve import SearchService
    from gbnns_tpu.eval.recall import recall_at_k

    base, query = fixture_data
    svc = SearchService(base, engine="fused", c=64)
    # small-corpus bin geometry: rebuild the index with test-sized tiles
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex
    svc.fused = FusedScanIndex(base, bin_size=32, chunk=256, tq=64)
    try:
        ids, dists = svc.submit(query[:32], None, 10)
        assert ids.shape == (32, 10)
        r10 = recall_at_k(np.asarray(ids), fixture_gt[:32], 10)
        assert r10 > 0.85
    finally:
        svc.stop()


def test_warm_buckets(fixture_data):
    """warm() compiles every power-of-two shape bucket up to max_batch."""
    base, query = fixture_data
    svc = SearchService(base, max_batch=512)
    try:
        assert svc.warm(k=5) == 2  # buckets 256, 512
        ids, _ = svc.submit(query[:7], None, 5)
        assert ids.shape == (7, 5)
    finally:
        svc.stop()


def test_pipelined_dispatch_many_batches(fixture_data, fixture_gt):
    """Many concurrent variable-size submits drain through the bounded
    in-flight queue; every waiter gets its own correctly-sliced rows."""
    from gbnns_tpu.eval.recall import recall_at_k

    base, query = fixture_data
    svc = SearchService(base, max_batch=256, max_wait_ms=1.0)
    sizes = [1, 3, 8, 17, 32, 24, 5, 2, 15, 11, 9]  # sums to 127 <= n_query
    offs = np.cumsum([0] + sizes)
    results = {}

    def call(i):
        q = query[offs[i]:offs[i] + sizes[i]]
        results[i] = svc.submit(q, None, 10)

    try:
        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(sizes))]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert set(results) == set(range(len(sizes)))
        for i, m in enumerate(sizes):
            ids, dists = results[i]
            assert ids.shape == (m, 10)
            r10 = recall_at_k(np.asarray(ids),
                              fixture_gt[offs[i]:offs[i] + m], 10)
            assert r10 >= 0.9, (i, r10)
            assert (np.diff(np.asarray(dists), axis=1) >= -1e-5).all()
    finally:
        svc.stop()


def test_dispatch_errors_delivered_to_waiters(fixture_data):
    """An engine failure surfaces as RuntimeError on the submitting
    thread instead of hanging the request."""
    base, query = fixture_data
    svc = SearchService(base)
    try:
        def boom(queries, queries_lo, k):
            raise ValueError("engine exploded")
        svc._search_device = boom
        with pytest.raises(RuntimeError, match="engine exploded"):
            svc.submit(query[:4], None, 5)
    finally:
        svc.stop()
