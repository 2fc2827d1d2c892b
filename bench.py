"""Headline benchmark — run on real TPU by the round driver.

Measures the BASELINE.json:5 headline: QPS at matched recall@1/recall@10 on a
SIFT-like corpus with a learned 128→32-d linear projection + full-dim
re-rank. Baseline for ``vs_baseline``: 2x a single-H100-class graph-ANN
engine at recall@10≈0.9, taken as 2 x 100k QPS = 200k QPS (CAGRA-class
magnitude from PAPERS.md:7; no reference numbers were published —
BASELINE.json:13). vs_baseline >= 1.0 means the ≥2x-H100 target is met.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "queries/s", "vs_baseline": ...}

Size knobs (env): GBNNS_BENCH_N (base size, default 100000),
GBNNS_BENCH_Q (queries, default 8192), GBNNS_BENCH_STEPS (train steps).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time


def main():
    t_start = time.perf_counter()
    import numpy as np

    # absorb the axon relay's first-transfer stall concurrently with setup
    def _warm():
        try:
            import jax.numpy as jnp
            np.asarray(jnp.zeros((1,), jnp.float32))
        except Exception:
            pass
    threading.Thread(target=_warm, daemon=True).start()

    import jax
    import jax.numpy as jnp

    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.dimred.train import TrainConfig, project, train_projection
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.search.rerank import rerank
    from gbnns_tpu.search.walker_jax import beam_search, default_entry_ids

    n = int(os.environ.get("GBNNS_BENCH_N", 100_000))
    nq = int(os.environ.get("GBNNS_BENCH_Q", 8192))
    steps = int(os.environ.get("GBNNS_BENCH_STEPS", 600))
    d, d_lo, K = 128, 32, 32
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log(f"bench: n={n} nq={nq} d={d}->{d_lo} K={K} "
        f"backend={jax.default_backend()}")

    data = make_synthetic(SyntheticSpec(
        n_base=n, n_query=nq, dim=d, n_clusters=max(64, n // 2000), seed=0))
    base, query = data["base"], data["query"]

    t0 = time.perf_counter()
    graph = build_knn_graph(base, K)
    build_time = time.perf_counter() - t0
    log(f"graph build: {build_time:.1f}s")

    t0 = time.perf_counter()
    train_nbrs = exact_ground_truth(base, base, k=11, q_chunk=16384)[:, 1:]
    trained = train_projection(base, train_nbrs, TrainConfig(
        d_out=d_lo, steps=steps, batch_size=1024, k_pos=10))
    base_lo, query_lo = project(trained, base), project(trained, query)
    log(f"projection train+apply: {time.perf_counter()-t0:.1f}s "
        f"(final loss {trained['losses'][-50:].mean():.4f})")

    gt = exact_ground_truth(query, base, k=10, q_chunk=16384)

    qlo, qfull = jnp.asarray(query_lo), jnp.asarray(query)
    blo, bfull = jnp.asarray(base_lo), jnp.asarray(base)
    gj = jnp.asarray(graph)

    best = None
    results = []
    for ef in (32, 48, 64, 96, 128, 192):
        entries = default_entry_ids(n, min(32, ef))

        def run(ef=ef, entries=entries):
            res = beam_search(qlo, blo, gj, entries, ef=ef, max_hops=192)
            ids, _ = rerank(qfull, bfull, res.ids, 10)
            return ids

        ids = jax.block_until_ready(run())       # compile + recall
        r1 = recall_at_k(np.asarray(ids), gt, 1)
        r10 = recall_at_k(np.asarray(ids), gt, 10)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            jax.block_until_ready(run())
        qps = nq / ((time.perf_counter() - t0) / iters)
        results.append(dict(ef=ef, qps=qps, r1=r1, r10=r10))
        log(f"  ef={ef:4d} R@1={r1:.4f} R@10={r10:.4f} QPS={qps:,.0f}")
        if r10 >= 0.90 and (best is None or qps > best["qps"]):
            best = results[-1]
        if r10 >= 0.995:
            break

    if best is None:  # recall target unmet: report the highest-recall point
        best = max(results, key=lambda r: r["r10"])
    baseline_qps = 200_000.0
    out = {
        "metric": "qps@r10>=0.90 sift-like-100k 128d->32d rerank",
        "value": round(best["qps"], 1),
        "unit": "queries/s",
        "vs_baseline": round(best["qps"] / baseline_qps, 4),
        "recall_at_1": round(best["r1"], 4),
        "recall_at_10": round(best["r10"], 4),
        "ef": best["ef"],
        "graph_build_s": round(build_time, 1),
        "n_base": n,
        "total_bench_s": round(time.perf_counter() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
