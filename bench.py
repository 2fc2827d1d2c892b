"""Headline benchmark — run on real TPU by the round driver.

Measures the BASELINE.json:5 headline: QPS at matched recall@1/recall@10 on a
SIFT-like corpus with a learned 128→32-d linear projection + full-dim
re-rank, using the framework's best engine for the hardware:

  * flat  — projected MXU scan + exact re-rank (the TPU-native fast path:
            the learned projection turns scoring into a thin dense matmul)
  * graph — lockstep beam walker over the exact kNN graph (the reference's
            algorithm re-architected; reported alongside)

Baseline for ``vs_baseline``: 2x a single-H100-class graph-ANN engine at
recall@10≈0.9, taken as 2 x 100k QPS = 200k QPS (CAGRA-class magnitude from
PAPERS.md:7; the reference published no numbers — BASELINE.json:13).
vs_baseline >= 1.0 means the ≥2x-H100 target is met.

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
    if os.environ.get("GBNNS_BENCH_CPU"):  # offline smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.dimred.train import TrainConfig, project, train_projection
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.search.flat import FlatIndex
    from gbnns_tpu.search.rerank import rerank
    from gbnns_tpu.search.walker_jax import beam_search, default_entry_ids

    n = int(os.environ.get("GBNNS_BENCH_N", 100_000))
    nq = int(os.environ.get("GBNNS_BENCH_Q", 16384))
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

    def timed(run, compile_first=True):
        ids = jax.block_until_ready(run())[0]
        r1 = recall_at_k(np.asarray(ids), gt, 1)
        r10 = recall_at_k(np.asarray(ids), gt, 10)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(run())
        return nq / ((time.perf_counter() - t0) / iters), r1, r10

    # ---- flat engine: projected MXU scan + rerank ---------------------
    flat = FlatIndex(base, base_lo)
    qlo_j = jnp.asarray(query_lo)
    q_j = jnp.asarray(query)
    best_flat = None
    for c in (16, 32, 64, 128):
        qps, r1, r10 = timed(lambda c=c: flat.search(q_j, qlo_j, k=10, c=c))
        log(f"  flat c={c:4d} R@1={r1:.4f} R@10={r10:.4f} QPS={qps:,.0f}")
        if r10 >= 0.90 and (best_flat is None or qps > best_flat["qps"]):
            best_flat = dict(engine="flat", c=c, qps=qps, r1=r1, r10=r10)
        if r10 >= 0.995:
            break

    # ---- graph engine: lockstep beam walker + rerank ------------------
    blo_j = jnp.asarray(base_lo)
    bfull_j = jnp.asarray(base)
    gj = jnp.asarray(graph)
    best_graph = None
    for ef in (32, 64, 128):
        entries = default_entry_ids(n, min(32, ef))

        def run(ef=ef, entries=entries):
            res = beam_search(qlo_j, blo_j, gj, entries, ef=ef, max_hops=192)
            return rerank(q_j, bfull_j, res.ids, 10)

        qps, r1, r10 = timed(run)
        log(f"  graph ef={ef:3d} R@1={r1:.4f} R@10={r10:.4f} QPS={qps:,.0f}")
        if r10 >= 0.90 and (best_graph is None or qps > best_graph["qps"]):
            best_graph = dict(engine="graph", ef=ef, qps=qps, r1=r1, r10=r10)
        if r10 >= 0.97:
            break

    best = max([b for b in (best_flat, best_graph) if b],
               key=lambda b: b["qps"], default=None)
    if best is None:
        best = dict(engine="none", qps=0.0, r1=0.0, r10=0.0)
    baseline_qps = 200_000.0
    out = {
        "metric": f"qps@r10>=0.90 sift-like-{n//1000}k 128d->32d rerank",
        "value": round(best["qps"], 1),
        "unit": "queries/s",
        "vs_baseline": round(best["qps"] / baseline_qps, 4),
        # The reference published no numbers (BASELINE.json:13); 200k QPS is
        # the assumed 2x-single-H100-class target, not a measured baseline.
        "baseline_assumed": True,
        "baseline_source": "2 x 100k QPS CAGRA-class single-GPU magnitude "
                           "(PAPERS.md:7, from-memory); BASELINE.json:5 "
                           "'>=2x single-H100-class'",
        "engine": best["engine"],
        "recall_at_1": round(best["r1"], 4),
        "recall_at_10": round(best["r10"], 4),
        "flat_best": best_flat,
        "graph_best": best_graph,
        "graph_build_s": round(build_time, 1),
        "n_base": n,
        "total_bench_s": round(time.perf_counter() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
