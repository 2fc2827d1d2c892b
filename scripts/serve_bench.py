"""End-to-end HTTP serving throughput at 1M (VERDICT r2 item 7).

Round 2 measured 4,039 q/s end-to-end vs 406k engine QPS — the stdlib
JSON stack. This benchmark drives the round-3 raw binary protocol
(POST /search_raw) over persistent HTTP/1.1 connections from several
client threads, fused engine, n=1M, and writes
results/serve_http_1m.json. Target: >= 20k q/s.

Usage: python scripts/serve_bench.py [--n 1000000] [--clients 16]
       [--batch 1024] [--secs 20]

Load parameters matter: the round-3 52.4k q/s number was measured at
clients=16/batch=1024; an early round-4 refresh at 8/512 measured only
23.1k q/s on the SAME engine — the service was under-offered (smaller
coalesced dispatches each pay the ~26 ms fixed H2D), not slower. The
defaults now pin the round-3 load so refreshes are apples-to-apples.
"""

from __future__ import annotations

import argparse
import http.client
import json
import pathlib
import sys
import threading
import time

_src = str(pathlib.Path(__file__).resolve().parents[1] / "src")
if _src not in sys.path:
    sys.path.insert(0, _src)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--secs", type=float, default=20.0)
    ap.add_argument("--engine", default="fused")
    ap.add_argument("--json-baseline", action="store_true",
                    help="also measure the JSON protocol for comparison")
    ap.add_argument("--h2d-dtype", dest="h2d_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="device-upload dtype: bfloat16 halves the "
                         "per-dispatch H2D bytes, the dominant serving tax "
                         "(results/serve_profile_1m.json: engine 372k -> "
                         "+f32 H2D 59.4k -> +bf16 H2D 69.3k)")
    ap.add_argument("--max-batch", type=int, default=8192,
                    help="coalesce ceiling; 16384 amortizes the ~26 ms "
                         "fixed dispatch RTT over the full 16x1024 "
                         "offered load")
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--out", default="results/serve_http_1m.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()

    from http.server import ThreadingHTTPServer

    from gbnns_tpu.dimred.pca import pca_fit, pca_transform
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.serve import (SearchService, make_handler,
                                 pack_raw_request, unpack_raw_response)

    n = args.n
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    data = make_synthetic(SyntheticSpec(n_base=n, n_query=8192, dim=128,
                                        n_clusters=max(64, n // 2000),
                                        seed=0))
    base, query = data["base"], data["query"]
    pm = pca_fit(base, 32)
    base_lo = pca_transform(pm, base)
    # device-side projection: pca_transform round-trips through host
    # (np.asarray in/out), which would add a D2H + H2D to every dispatch;
    # the service uploads queries once and projects on device.
    import jax
    import jax.numpy as jnp2
    pmean = jnp2.asarray(pm.mean)
    pcomp = jnp2.asarray(pm.components)
    proj = jax.jit(lambda q: (jnp2.asarray(q) - pmean[None, :]) @ pcomp)
    gt = exact_ground_truth(query, base, k=10, q_chunk=8192)

    svc = SearchService(base, base_lo, engine=args.engine, c=32,
                        # 10 ms coalesce window: requests arrive staggered
                        # over ~100 ms; at 2 ms the dispatcher issued many
                        # small batches, each paying the ~26 ms fixed H2D
                        max_batch=args.max_batch,
                        max_wait_ms=args.max_wait_ms, projection=proj,
                        h2d_dtype=args.h2d_dtype)
    t0 = time.perf_counter()
    nb = svc.warm(k=10)
    log(f"warmed {nb} shape buckets in {time.perf_counter() - t0:.1f}s")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    log(f"serving on :{port} engine={args.engine}")

    # recall sanity through the full wire path
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/search_raw", body=pack_raw_request(query[:256], 10))
    ids, _ = unpack_raw_response(conn.getresponse().read())
    r10 = recall_at_k(ids, gt[:256], 10)
    log(f"wire-path R@10 = {r10:.4f}")

    stop_at = [0.0]
    counts = [0] * args.clients
    lats: list[float] = []

    def client(ci):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        rng = np.random.default_rng(ci)
        while time.perf_counter() < stop_at[0]:
            qs = query[rng.integers(0, query.shape[0] - args.batch)
                       :][:args.batch]
            t0 = time.perf_counter()
            c.request("POST", "/search_raw",
                      body=pack_raw_request(qs, 10))
            r = c.getresponse()
            body = r.read()
            if r.status != 200:
                raise RuntimeError(body[:200])
            unpack_raw_response(body)
            lats.append(time.perf_counter() - t0)
            counts[ci] += args.batch
        c.close()

    # warmup round so jit compiles don't pollute the measurement
    stop_at[0] = time.perf_counter() + 3.0
    ths = [threading.Thread(target=client, args=(i,))
           for i in range(args.clients)]
    [t.start() for t in ths]
    [t.join() for t in ths]
    counts = [0] * args.clients
    lats.clear()

    stop_at[0] = time.perf_counter() + args.secs
    t0 = time.perf_counter()
    ths = [threading.Thread(target=client, args=(i,))
           for i in range(args.clients)]
    [t.start() for t in ths]
    [t.join() for t in ths]
    wall = time.perf_counter() - t0
    total = sum(counts)
    qps = total / wall
    lat = np.asarray(lats)
    result = dict(
        n=n, engine=args.engine, protocol="raw+keepalive",
        h2d_dtype=args.h2d_dtype, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        clients=args.clients, batch=args.batch,
        queries=total, wall_s=round(wall, 2),
        qps_end_to_end=round(qps, 1),
        latency_ms=dict(p50=round(float(np.percentile(lat, 50)) * 1e3, 1),
                        p95=round(float(np.percentile(lat, 95)) * 1e3, 1),
                        p99=round(float(np.percentile(lat, 99)) * 1e3, 1)),
        wire_recall_at_10=round(float(r10), 4),
        note="end-to-end through HTTP/1.1 keep-alive + raw binary bodies; "
             "round-2 JSON stack measured 4,039 q/s on the same engine. "
             "Throughput is offered-load dependent (coalesced dispatch "
             "amortizes the ~26 ms fixed H2D): 8 clients x 512 measured "
             "23.1k q/s on this same engine.",
    )
    log(json.dumps(result, indent=2))
    pathlib.Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(dict(qps=result["qps_end_to_end"])))
    httpd.shutdown()
    svc.stop()


if __name__ == "__main__":
    main()
