"""Attribute the serving stack tax, stage by stage (VERDICT r4 item 3).

results/serve_http_1m.json pins the wire number at 48.3k q/s while the
same fused engine does ~395k in-process — an unexplained ~8x. This script
measures the SAME engine through four nested paths and writes
results/serve_profile_1m.json so the gap is attributed, not guessed:

  A. engine, queries device-resident (the bench methodology)
  B. engine + per-batch H2D upload of full-d f32 queries from host numpy
     + on-device projection — exactly SearchService._search_device minus
     bucketing. B-A is the H2D/projection tax. Also measured with bf16
     upload (halved wire bytes; the round-5 fix candidate).
  C. SearchService.submit() from N in-process threads (no HTTP):
     adds coalescing, dispatcher, completer, per-request slicing. C-B is
     the dispatch-machinery tax.
  D. full HTTP wire at the pinned 16x1024 load (serve_bench methodology).
     D-C is the HTTP/socket/GIL tax.

Usage: python scripts/serve_profile.py [--n 1000000] [--secs 12]
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
    ap.add_argument("--secs", type=float, default=12.0)
    ap.add_argument("--h2d-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="service upload dtype for stages C/D")
    ap.add_argument("--out", default="results/serve_profile_1m.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()

    from gbnns_tpu.dimred.pca import pca_fit, pca_transform
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex
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
    pmean = jnp.asarray(pm.mean)
    pcomp = jnp.asarray(pm.components)
    proj = jax.jit(lambda q: (q.astype(jnp.float32) - pmean[None, :]) @ pcomp)

    fused = FusedScanIndex(base, base_lo)
    stages: dict[str, dict] = {}

    # ---- A: device-resident queries (bench methodology) ----------------
    q_dev = jnp.asarray(query)
    qlo_dev = proj(q_dev)
    run_a = lambda: fused.search(q_dev, qlo_dev, k=10, c=32, merge=None)
    jax.block_until_ready(run_a())
    iters = 8
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run_a()
    jax.block_until_ready(out)
    qps_a = query.shape[0] * iters / (time.perf_counter() - t0)
    stages["A_engine_resident"] = dict(qps=round(qps_a, 1), c=32,
                                       batch=query.shape[0])
    log(f"A engine resident: {qps_a:,.0f} q/s")

    # ---- B: + per-batch H2D upload + device projection -----------------
    def stage_b(upload_dtype, name):
        host_q = (query.astype(np.float32) if upload_dtype == "float32"
                  else query.astype(jnp.bfloat16))

        def run():
            qd = jnp.asarray(host_q).astype(jnp.float32)
            return fused.search(qd, proj(qd), k=10, c=32, merge=None)

        jax.block_until_ready(run())
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = run()
        jax.block_until_ready(out)
        qps = query.shape[0] * iters / (time.perf_counter() - t0)
        bytes_per_q = host_q.dtype.itemsize * query.shape[1]
        stages[name] = dict(qps=round(qps, 1), upload_dtype=str(upload_dtype),
                            h2d_bytes_per_query=bytes_per_q)
        log(f"{name}: {qps:,.0f} q/s ({bytes_per_q} B/query H2D)")
        return qps

    stage_b("float32", "B_plus_h2d_f32")
    stage_b("bfloat16", "B_plus_h2d_bf16")

    # ---- C: SearchService.submit from N threads (no HTTP) --------------
    svc = SearchService(base, base_lo, engine="fused", c=32,
                        max_batch=8192, max_wait_ms=10.0, projection=proj,
                        h2d_dtype=args.h2d_dtype)
    t0 = time.perf_counter()
    nb = svc.warm(k=10)
    log(f"warmed {nb} buckets in {time.perf_counter() - t0:.1f}s")

    def drive_submit(secs):
        stop_at = time.perf_counter() + secs
        counts = [0] * args.clients
        lats: list[float] = []

        def client(ci):
            rng = np.random.default_rng(ci)
            while time.perf_counter() < stop_at:
                qs = query[rng.integers(0, query.shape[0] - args.batch)
                           :][:args.batch]
                t1 = time.perf_counter()
                svc.submit(np.ascontiguousarray(qs), None, 10)
                lats.append(time.perf_counter() - t1)
                counts[ci] += args.batch
        ths = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
        t1 = time.perf_counter()
        [t.start() for t in ths]
        [t.join() for t in ths]
        return sum(counts) / (time.perf_counter() - t1), lats

    drive_submit(3.0)  # warm the shape buckets actually hit
    qps_c, lats_c = drive_submit(args.secs)
    stages["C_submit_threads"] = dict(
        qps=round(qps_c, 1), clients=args.clients, batch=args.batch,
        h2d_dtype=args.h2d_dtype,
        p50_ms=round(float(np.percentile(lats_c, 50)) * 1e3, 1))
    log(f"C submit threads: {qps_c:,.0f} q/s")

    # ---- D: full HTTP wire at the pinned load ---------------------------
    from http.server import ThreadingHTTPServer
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def drive_http(secs):
        stop_at = time.perf_counter() + secs
        counts = [0] * args.clients
        lats: list[float] = []

        def client(ci):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            rng = np.random.default_rng(ci)
            while time.perf_counter() < stop_at:
                qs = query[rng.integers(0, query.shape[0] - args.batch)
                           :][:args.batch]
                t1 = time.perf_counter()
                c.request("POST", "/search_raw",
                          body=pack_raw_request(qs, 10))
                body = c.getresponse().read()
                unpack_raw_response(body)
                lats.append(time.perf_counter() - t1)
                counts[ci] += args.batch
            c.close()
        ths = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
        t1 = time.perf_counter()
        [t.start() for t in ths]
        [t.join() for t in ths]
        return sum(counts) / (time.perf_counter() - t1), lats

    drive_http(3.0)
    qps_d, lats_d = drive_http(args.secs)
    stages["D_http_wire"] = dict(
        qps=round(qps_d, 1), clients=args.clients, batch=args.batch,
        p50_ms=round(float(np.percentile(lats_d, 50)) * 1e3, 1))
    log(f"D http wire: {qps_d:,.0f} q/s")

    qps_b = stages["B_plus_h2d_f32"]["qps"]
    result = dict(
        n=n, engine="fused", stages=stages,
        attribution=dict(
            h2d_projection_x=round(qps_a / qps_b, 2),
            dispatch_machinery_x=round(qps_b / qps_c, 2),
            http_stack_x=round(qps_c / qps_d, 2),
            total_x=round(qps_a / qps_d, 2)),
        note="multiplicative tax attribution: A/B = per-batch H2D upload + "
             "device projection; B/C = coalesce/dispatch/completer threads "
             "+ per-request numpy slicing; C/D = HTTP socket + handler "
             "threads + client GIL share (clients run in-process).")
    p = pathlib.Path(args.out)
    p.parent.mkdir(exist_ok=True)
    p.write_text(json.dumps(result, indent=2))
    print(json.dumps(dict(out=str(p),
                          A=qps_a, B=qps_b, C=qps_c, D=qps_d)))
    httpd.shutdown()
    svc.stop()


if __name__ == "__main__":
    main()
