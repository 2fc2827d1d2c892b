"""Minimal production serving runtime: an HTTP search service.

The reference is batch-offline only (SURVEY.md §2 — "no serving stack");
this module adds the deployment-shaped surface a production user of the
engine needs: load staged artifacts (vectors, projection, graph), keep the
index device-resident, micro-batch concurrent requests, and serve
``POST /search`` with JSON vectors. Stdlib-only (http.server) — no
framework dependencies exist in this image.

Design: request threads enqueue queries; a single dispatcher thread drains
the queue every ``max_wait_ms`` (or when ``max_batch`` is reached) and runs
ONE device batch — the TPU-native way to serve many small requests, since
per-dispatch latency dominates single-query execution (~26 ms measured
round-trip on this relay vs ~35 ms for an 8192-query batch).

Start:  gbnns serve --base base.fvecs [--base-lo base_lo.fvecs]
                    [--graph graph.npy] --port 8390
Query:  curl -d '{"queries": [[...]], "k": 10}' localhost:8390/search

Two wire protocols (connections are HTTP/1.1 persistent):
  POST /search       JSON  — convenient, ~100 ms encode/decode per large
                     batch (debug/low-rate use)
  POST /search_raw   raw little-endian binary (pack_raw_request /
                     unpack_raw_response) — the production path; numpy
                     buffer in/out, no per-element Python
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

import numpy as np


class _Pending:
    __slots__ = ("queries", "queries_lo", "k", "event", "result", "error")

    def __init__(self, queries, queries_lo, k):
        self.queries = queries
        self.queries_lo = queries_lo
        self.k = k
        self.event = threading.Event()
        self.result: Any = None
        self.error: str | None = None


class SearchService:
    """Device-resident index + micro-batching dispatcher."""

    def __init__(self, base, base_lo=None, graph=None, *, metric="l2",
                 engine: str = "flat", ef: int = 64, c: int = 64,
                 max_batch: int = 4096, max_wait_ms: float = 2.0,
                 projection=None, scan_dtype: str = "bfloat16",
                 centroids_path: str | None = None,
                 h2d_dtype: str = "float32"):
        import jax.numpy as jnp

        from gbnns_tpu.search.flat import FlatIndex

        self.metric = metric
        self.engine = engine
        self.ef = ef
        self.c = c
        # ``h2d_dtype="bfloat16"``: convert the coalesced query batch to
        # bf16 on the host before the device upload, then cast back to f32
        # on device. Queries dominate the dispatch's host->device bytes
        # (512 B/query at d=128 f32) and the relay link runs at ~45 MB/s,
        # so halving them halves the serving H2D floor; the only semantic
        # cost is bf16 rounding of the query values themselves (measured
        # <0.001 R@10 on the 1M config — results/serve_profile_1m.json).
        if h2d_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"h2d_dtype must be float32|bfloat16, "
                             f"got {h2d_dtype!r}")
        self.h2d_dtype = h2d_dtype
        # optional callable full-d -> low-d; called with the DEVICE-resident
        # query batch (one upload per dispatch) — keep it device-side
        # (jnp ops / jit); a host round-tripping projection adds a
        # D2H + H2D to every dispatch on this ~45 MB/s relay link.
        self.projection = projection
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()

        self.flat = FlatIndex(base, base_lo, metric=metric)
        self.graph = None
        self.gidx = None
        self.fused = None
        if engine == "fused":
            # the headline engine (results/bench_1m_learned_r2.json):
            # binned Pallas scan + exact re-rank; c is the recall knob
            from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex

            self.fused = FusedScanIndex(
                base, base_lo, metric=metric,
                scan_dtype="int8" if scan_dtype == "int8" else jnp.bfloat16)
        elif engine == "graph_pallas":
            # the DMA-payload walker + centroid entries (the fast graph path,
            # results/walker_ab_1m.json); reuses the staged graph artifact
            if graph is None:
                raise ValueError("engine='graph_pallas' requires a graph artifact")
            from gbnns_tpu.search.graph_index import GraphIndex

            entries = None
            if centroids_path:
                # staged quantizer artifact: k-means is compile-bound
                # (~100 s cold per process) — restarts load, not refit
                from gbnns_tpu.search.entries import CentroidEntries

                entries = CentroidEntries.load(centroids_path)
            self.gidx = GraphIndex.build(
                base, base_lo, metric=metric,
                ncent=max(64, min(4096, np.asarray(base).shape[0] // 256)),
                graph=np.asarray(graph, np.int32), entries=entries)
        elif engine == "graph":
            if graph is None:
                raise ValueError("engine='graph' requires a graph artifact")
            from gbnns_tpu.search.walker_jax import default_entry_ids

            self.graph = jnp.asarray(np.asarray(graph, np.int32))
            self.base_lo_f32 = jnp.asarray(
                np.asarray(base_lo if base_lo is not None else base,
                           np.float32))
            # entry count must never exceed the effective pool size
            # (beam_search rejects E > ef); _search uses ef=max(self.ef, k),
            # so clamping to self.ef keeps any request valid.
            self.entries = default_entry_ids(self.graph.shape[0],
                                             min(32, self.ef))

        # Warm the engine before serving: the first search pays jit compile
        # plus the relay round trip (>30 s for the Pallas engines at 1M),
        # which would otherwise expire the first requests' submit timeout.
        self._d_full = np.asarray(base).shape[1]
        self._d_lo = (np.asarray(base_lo).shape[1]
                      if base_lo is not None else None)
        try:
            dq = np.zeros((8, self._d_full), np.float32)
            dlo = (np.zeros((8, self._d_lo), np.float32)
                   if self._d_lo is not None else None)
            self._search(dq, dlo, 1)
        except Exception:
            pass  # warmup is best-effort; real requests surface real errors

        # Pipelined dispatch: the dispatcher issues device batches without
        # blocking (XLA dispatch is async) and hands them to a completion
        # thread that pays the device->host transfer (~26 ms relay RTT
        # each). With per-batch blocking those RTTs serialize with compute
        # and cap the service at ~1/(RTT+compute); overlapped, the floor
        # is max(RTT, compute). Bounded depth = backpressure (the relay
        # wedges past ~100 queued executions; 4 in flight is plenty).
        self._inflight: "queue.Queue[tuple]" = queue.Queue(maxsize=4)
        self._dispatcher = threading.Thread(target=self._run, daemon=True)
        self._dispatcher.start()
        self._completer = threading.Thread(target=self._complete, daemon=True)
        self._completer.start()

    def warm(self, k: int = 10, *, with_lo: bool | None = None) -> int:
        """Compile every query-shape bucket up to ``max_batch`` before
        taking traffic. Coalesced batch sizes vary request to request, so
        each power-of-two bucket is a distinct jit program (~12-20 s
        compile for the Pallas engines at 1M on this relay) — without
        pre-warming those compiles land inside live requests (measured:
        p95 21 s mid-benchmark). Returns the number of buckets warmed."""
        if with_lo is None:
            with_lo = self._d_lo is not None and self.projection is None
        bucket, warmed = 256, 0
        while bucket <= self.max_batch:
            q = np.zeros((bucket, self._d_full), np.float32)
            qlo = (np.zeros((bucket, self._d_lo), np.float32)
                   if with_lo else None)
            self._search(q, qlo, k)
            warmed += 1
            bucket *= 2
        return warmed

    def submit(self, queries: np.ndarray, queries_lo, k: int,
               timeout: float = 30.0):
        p = _Pending(queries, queries_lo, k)
        self._q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("search timed out")
        if p.error:
            raise RuntimeError(p.error)
        return p.result

    def _drain(self) -> list[_Pending]:
        batch = [self._q.get()]
        has_lo = batch[0].queries_lo is not None
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        total = batch[0].queries.shape[0]
        deferred = []
        while total < self.max_batch and time.perf_counter() < deadline:
            try:
                p = self._q.get(timeout=max(0.0, deadline - time.perf_counter()))
            except queue.Empty:
                break
            # only coalesce requests of the same shape-kind: mixing
            # with-queries_lo and without would either crash the
            # concatenate or silently search the wrong space
            if (p.queries_lo is not None) != has_lo \
                    or p.queries.shape[1] != batch[0].queries.shape[1]:
                deferred.append(p)
                continue
            batch.append(p)
            total += p.queries.shape[0]
        for p in deferred:  # next dispatcher cycle picks these up
            self._q.put(p)
        return batch

    def _run(self):
        while not self._stop.is_set():
            try:
                batch = self._drain()
            except Exception:
                continue
            try:
                qs = np.concatenate([p.queries for p in batch])
                qlos = (np.concatenate([p.queries_lo for p in batch])
                        if batch[0].queries_lo is not None else None)
                k = max(p.k for p in batch)
                ids, dists, m = self._search_device(qs, qlos, k)
            except Exception as e:  # deliver dispatch errors to waiters
                for p in batch:
                    p.error = f"{type(e).__name__}: {e}"
                    p.event.set()
                continue
            self._inflight.put((batch, ids, dists))

    def _complete(self):
        while not self._stop.is_set():
            try:
                batch, ids, dists = self._inflight.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                ids = np.asarray(ids)    # blocks until the device batch
                dists = np.asarray(dists)  # lands; overlaps next dispatch
                off = 0
                for p in batch:
                    m = p.queries.shape[0]
                    p.result = (ids[off:off + m, :p.k],
                                dists[off:off + m, :p.k])
                    off += m
                    p.event.set()
            except Exception as e:  # deliver errors to waiters
                for p in batch:
                    p.error = f"{type(e).__name__}: {e}"
                    p.event.set()

    def _search(self, queries, queries_lo, k):
        ids, dists, m = self._search_device(queries, queries_lo, k)
        return np.asarray(ids)[:m], np.asarray(dists)[:m]

    def _search_device(self, queries, queries_lo, k):
        import jax.numpy as jnp

        # shape bucketing: jit compiles one program per query-batch shape,
        # and a coalesced batch's size varies request to request (~12 s
        # compile each on this relay). Pad to the next power-of-two bucket
        # (min 256) with repeated rows and slice the padding back off.
        m = queries.shape[0]
        bucket = 256
        while bucket < m:
            bucket *= 2
        if bucket != m:
            pad = bucket - m
            queries = np.concatenate(
                [queries, np.repeat(queries[-1:], pad, axis=0)])
            if queries_lo is not None:
                queries_lo = np.concatenate(
                    [queries_lo, np.repeat(queries_lo[-1:], pad, axis=0)])
        # ONE host->device upload per dispatch: the relay link runs at
        # ~26 ms + ~22 ms/MB, so uploading full-d queries for the
        # projection and again for the engine doubled the serving floor.
        # Project on device from the same uploaded array instead.
        if self.h2d_dtype == "bfloat16":
            # halve the upload bytes (see __init__); cast back on device
            queries = jnp.asarray(
                np.asarray(queries, np.float32).astype(jnp.bfloat16)
            ).astype(jnp.float32)
            if queries_lo is not None:
                queries_lo = jnp.asarray(
                    np.asarray(queries_lo, np.float32).astype(jnp.bfloat16)
                ).astype(jnp.float32)
        else:
            queries = jnp.asarray(queries, dtype=jnp.float32)
        if queries_lo is None and self.projection is not None:
            queries_lo = self.projection(queries)
        ids, dists = self._search_exact(queries, queries_lo, k)
        return ids, dists, m

    def _search_exact(self, queries, queries_lo, k):
        if self.engine == "fused":
            # merge=None: backend-aware default (pallas on TPU, exact on
            # the interpreted CPU fallback where pallas is orders slower)
            return self.fused.search(queries, queries_lo, k=k,
                                     c=max(self.c, k), merge=None)
        if self.engine == "graph_pallas":
            return self.gidx.search(queries, queries_lo, k=k,
                                    ef=max(self.ef, k),
                                    num_entries=min(16, max(self.ef, k)))
        if self.engine == "graph":
            from gbnns_tpu.search.rerank import rerank
            from gbnns_tpu.search.walker_jax import beam_search
            import jax.numpy as jnp

            ql = jnp.asarray(queries_lo if queries_lo is not None else queries,
                             dtype=jnp.float32)
            res = beam_search(ql, self.base_lo_f32, self.graph, self.entries,
                              ef=max(self.ef, k), metric=self.metric)
            return rerank(jnp.asarray(queries, dtype=jnp.float32),
                          self.flat.base_full, res.ids, k, metric=self.metric)
        return self.flat.search(queries, queries_lo, k=k,
                                c=max(self.c, k))

    def stop(self):
        self._stop.set()


RAW_MAGIC = 0x47424E31  # "GBN1": raw little-endian binary search protocol


def pack_raw_request(queries: np.ndarray, k: int) -> bytes:
    """Client-side encoder for POST /search_raw: 16-byte header
    (magic, n, d, k int32 LE) + n*d float32 LE query vectors."""
    q = np.ascontiguousarray(queries, dtype="<f4")
    hdr = np.array([RAW_MAGIC, q.shape[0], q.shape[1], k], dtype="<i4")
    return hdr.tobytes() + q.tobytes()


def unpack_raw_response(body: bytes):
    """Client-side decoder: (ids (n,k) int32, dists (n,k) f32)."""
    n, k = np.frombuffer(body[:8], dtype="<i4")
    ids = np.frombuffer(body[8:8 + 4 * n * k], dtype="<i4").reshape(n, k)
    dists = np.frombuffer(body[8 + 4 * n * k:], dtype="<f4").reshape(n, k)
    return ids, dists


def make_handler(service: SearchService):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1: persistent connections (every reply carries
        # Content-Length, so keep-alive is safe). Re-handshaking per
        # request cost ~40% of round-2's end-to-end throughput.
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_raw(self, payload: bytes):
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "n": int(service.flat.base_full.shape[0]),
                                  "engine": service.engine})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/search_raw":
                # raw binary protocol (VERDICT r2 item 7): the JSON stack
                # cost ~100 ms per large batch in encode/decode alone;
                # numpy frombuffer/tobytes is ~free. Body layout documented
                # at pack_raw_request/unpack_raw_response.
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(length)
                    if length < 16:
                        raise ValueError("raw body too short")
                    magic, n, d, k = np.frombuffer(body[:16], dtype="<i4")
                    if magic != RAW_MAGIC:
                        raise ValueError("bad magic (expected GBN1)")
                    if n <= 0 or d <= 0 or not 0 < k <= 1024:
                        raise ValueError(f"bad raw header n={n} d={d} k={k}")
                    d_index = int(service.flat.base_full.shape[1])
                    if d != d_index:
                        raise ValueError(f"query dim {d} != index dim "
                                         f"{d_index}")
                    if length != 16 + 4 * n * d:
                        raise ValueError("raw body length mismatch")
                    queries = np.frombuffer(body[16:], dtype="<f4") \
                        .reshape(n, d)
                    ids, dists = service.submit(queries, None, int(k))
                    hdr = np.array([ids.shape[0], ids.shape[1]], dtype="<i4")
                    self._reply_raw(
                        hdr.tobytes()
                        + np.ascontiguousarray(ids, dtype="<i4").tobytes()
                        + np.ascontiguousarray(dists, dtype="<f4").tobytes())
                except (ValueError, TypeError) as e:
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                except Exception as e:
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if self.path != "/search":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                queries = np.asarray(req["queries"], dtype=np.float32)
                if queries.ndim != 2:
                    raise ValueError("queries must be (n, d)")
                if queries.shape[0] == 0:
                    # an empty batch would defeat the shape bucketing
                    # (pad-by-repeat has no row to repeat) and reach the
                    # engine as a 0-row jit call; clean 400 instead
                    raise ValueError("empty query batch")
                k = int(req.get("k", 10))
                qlo = req.get("queries_lo")
                qlo = np.asarray(qlo, np.float32) if qlo is not None else None
                t0 = time.perf_counter()
                ids, dists = service.submit(queries, qlo, k)
                self._reply(200, {
                    "ids": np.asarray(ids).tolist(),
                    # C-speed float conversion: a per-element Python loop
                    # over the dists burned ~100 ms per large batch
                    "dists": np.asarray(dists, dtype=np.float64).tolist(),
                    "took_ms": round((time.perf_counter() - t0) * 1e3, 2),
                })
            except (KeyError, ValueError, TypeError) as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(service: SearchService, port: int = 8390, host: str = "127.0.0.1"):
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"gbnns serving on http://{host}:{port} "
          f"(engine={service.engine})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.stop()
