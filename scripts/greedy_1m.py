"""Config 1 at its literal scale: SIFT1M greedy/beam search, NO reduction.

BASELINE.json:7 — "SIFT1M greedy search on exact kNN graph, no
dimensionality reduction". The only artifact on file is the round-1
s0.1 run (20k-corpus walker at 15.4k QPS); every other BASELINE config
now has a literal-scale artifact. This runs the modern graph engine —
DMA-payload hop + centroid entries + exact re-rank — on the RAW 128-d
vectors at n=1,000,000:

  * full-d bf16 payload: rows are ceil((32*128/2+32)/1024) = 3 DMA tiles
    = 12 KB -> 12.3 GB payload + 0.26 GB bf16 re-rank corpus + 0.51 GB
    f32 corpus (walk-space seeding) ~= 13.1 GB — inside a 16 GB v5e,
    unlike the GIST shape (search/sizing.py); budget-gated at 15.2e9.
  * graph built in the full 128-d space (config 1 semantics: the walk
    measures raw distances). The fused binned sweep's cost is
    contraction-depth-invariant (SURVEY §12.2), so d=128 builds at
    ~the d'=32 rate.
  * fallback: if the payload OOMs on device regardless, re-run rows with
    the pure-JAX walker (XLA gathers, no payload) and record that.

Writes results/sift1m_greedy_1m.json (+ .png).

Usage: python scripts/greedy_1m.py [--n 1000000] [--b 8192]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import threading
import time

_root = pathlib.Path(__file__).resolve().parents[1]
_src = str(_root / "src")
if _src not in sys.path:
    sys.path.insert(0, _src)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=8192)
    ap.add_argument("--nq", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="results/sift1m_greedy_1m.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()

    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.eval.bench import TIMING_MODE
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.search.graph_index import GraphIndex

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    n, nq = args.n, args.nq
    data = make_synthetic(SyntheticSpec(
        n_base=n, n_query=nq, dim=128, n_clusters=max(64, n // 2000),
        seed=0))
    base, query = data["base"], data["query"]

    res_dir = _root / "results"
    gt_cache = res_dir / f"bench_gt_n{n}_q{nq}_seed0.npz"
    if gt_cache.exists():
        gt = np.load(gt_cache)["gt"]
        log(f"gt cache hit: {gt_cache.name}")
    else:
        gt = exact_ground_truth(query, base, k=10, q_chunk=16384)
        np.savez_compressed(gt_cache, gt=gt)

    # full-d exact-semantics graph, checkpointed to disk BEFORE the
    # payload allocation so an OOM there doesn't lose the build
    graph_cache = res_dir / f"greedy_graph_n{n}_k32_fulld.npy"
    if graph_cache.exists():
        graph = np.load(graph_cache)
        build_s = 0.0
        log(f"graph cache hit: {graph_cache.name}")
    else:
        t0 = time.perf_counter()
        graph = build_knn_graph(base, 32, backend="fused")
        build_s = time.perf_counter() - t0
        np.save(graph_cache, graph)
        log(f"full-d graph build {build_s:.1f}s")

    t0 = time.perf_counter()
    engine = "graph_pallas_fulld"
    try:
        gidx = GraphIndex.build(base, None, K=32, ncent=4096,
                                graph=graph, rerank_dtype=jnp.bfloat16,
                                hbm_budget=15.2e9)
        log(f"payload+centroids {time.perf_counter() - t0:.1f}s "
            f"(est {gidx.stats['est_hbm_bytes'] / 1e9:.1f} GB)")

        def make_run(ef):
            def run():
                return gidx.search(jnp.asarray(query), None, k=10, ef=ef)
            return run
    except Exception as e:
        log(f"payload engine failed ({type(e).__name__}: {str(e)[:200]}); "
            "falling back to walker_jax")
        engine = "walker_jax_fulld"
        from gbnns_tpu.search.rerank import rerank
        from gbnns_tpu.search.walker_jax import (beam_search,
                                                 default_entry_ids)
        base_j = jnp.asarray(base)
        graph_j = jnp.asarray(graph)
        ent = default_entry_ids(n, 16)

        def make_run(ef):
            def run():
                res = beam_search(jnp.asarray(query), base_j, graph_j,
                                  ent, ef=ef)
                return rerank(jnp.asarray(query), base_j, res.ids, 10)
            return run

    results = []
    for ef in (32, 48, 64, 96):
        run = make_run(ef)
        ids = np.asarray(jax.block_until_ready(run())[0])
        r1 = recall_at_k(ids, gt, 1)
        r10 = recall_at_k(ids, gt, 10)
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = run()
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / args.iters
        qps = nq / dt
        results.append(dict(
            label=f"greedy-ef{ef}", ef=ef, qps=round(qps, 1),
            latency_ms=round(dt * 1e3, 2), recall_at_1=round(float(r1), 4),
            recall_at_10=round(float(r10), 4), n_queries=nq,
            dist_comps_per_query=None, hops=0,
            extra=dict(engine=engine, knob="ef", timing=TIMING_MODE)))
        log(f"  ef={ef:3d} R@1={r1:.4f} R@10={r10:.4f} QPS={qps:,.0f}")
        if r10 >= 0.99:
            break

    out_path = _root / args.out
    out_path.write_text(json.dumps(dict(
        name="sift1m_greedy_1m",
        dataset="sift1m-like (synthetic, offline)", n_base=n, dim=128,
        d_out=128, method="none (config 1: no reduction)", n_queries=nq,
        timing=TIMING_MODE, graph_build_s=round(build_s, 1),
        engine=engine, results=results), indent=2, allow_nan=False))
    try:
        from gbnns_tpu.eval.plot import plot_sweeps

        plot_sweeps({engine: results},
                    str(out_path).replace(".json", ".png"),
                    title="sift1m greedy (no reduction), n=1M")
    except Exception as e:
        log(f"plot skipped: {e}")
    print(json.dumps(dict(out=args.out, engine=engine,
                          rows=len(results))))


if __name__ == "__main__":
    main()
