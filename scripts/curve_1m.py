"""The contract-scale engine-comparison curve (VERDICT r2 item 4).

BASELINE.json:2's primary metric is a recall-vs-QPS CURVE; round 2 only
recorded scalar bests at 1M. This script sweeps every engine's recall
knob at n=1M with the triplet-learned 128->32 projection on one corpus
and one query batch:

  fused   c in {12, 16, 32, 64}         (Pallas binned scan)
  gated   probes in {8, 16, 24, 32}     (cluster-gated scan, c=32)
  flat    c in {16, 32}                 (XLA scan + approx_max_k)
  ivf     probes in {8, 16, 32}         (cluster-pruned scan, c=32)
  graph   ef in {32, 48, 64}            (DMA-payload walker + centroids)

Writes results/sift1m_dr32_1m.json (+ .png via eval/plot.py). Reuses the
bench projection cache. ~20 min end to end on one v5e (graph build is
the long pole).

Usage: python scripts/curve_1m.py [--n 1000000] [--skip-graph]
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
    ap.add_argument("--b", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--skip-graph", action="store_true")
    ap.add_argument("--out", default="results/sift1m_dr32_1m.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()
    import jax

    from gbnns_tpu.dimred.train import (TrainConfig, load_projection,
                                        project, save_projection,
                                        train_projection)
    from gbnns_tpu.eval.bench import TIMING_MODE
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex
    from gbnns_tpu.search.flat import FlatIndex
    from gbnns_tpu.search.gated import GatedScanIndex
    from gbnns_tpu.search.ivf import IVFIndex

    n, B = args.n, args.b
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    data = make_synthetic(SyntheticSpec(
        n_base=n, n_query=B, dim=128, n_clusters=max(64, n // 2000),
        seed=0))
    base, query = data["base"], data["query"]

    # learned projection — same recipe + cache as bench.py (round 5:
    # validation-gated checkpoint selection, _sel cache key)
    cache = _root / "results" / f"bench_proj_n{n}_d128x32_s{args.steps}_sel_seed1.npz"
    trained = None
    if cache.exists():
        try:
            trained = load_projection(str(cache))
            log(f"projection cache hit: {cache.name}")
        except Exception:
            pass
    if trained is None:
        rng = np.random.default_rng(1)
        sub = rng.choice(n, size=min(262_144, n), replace=False)
        bs = base[sub]
        nbrs = exact_ground_truth(bs, bs, k=11, q_chunk=16384)[:, 1:]
        trained = train_projection(bs, nbrs, TrainConfig(
            d_out=32, steps=args.steps, batch_size=1024, k_pos=10,
            eval_every=max(50, args.steps // 4)))
        cache.parent.mkdir(exist_ok=True)
        save_projection(str(cache), trained)
    base_lo = np.asarray(project(trained, base))
    query_lo = np.asarray(project(trained, query))
    gt = exact_ground_truth(query, base, k=10, q_chunk=16384)
    qj, qlo = jnp.asarray(query), jnp.asarray(query_lo)

    def timed(run, iters=5):
        ids = jax.block_until_ready(run())[0]
        r1 = recall_at_k(np.asarray(ids), gt, 1)
        r10 = recall_at_k(np.asarray(ids), gt, 10)
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        return B / dt, dt * 1e3, r1, r10

    results = []

    def record(engine, knob, knob_val, qps, lat, r1, r10, **extra):
        # scans touch every reduced row + the re-rank pool; gated/ivf/graph
        # work is data-dependent -> null (strict JSON, SURVEY §5.1)
        dist_q = (float(n + knob_val) if engine in ("fused", "flat")
                  else None)
        row = dict(label=f"{engine}-{knob}{knob_val}", ef=knob_val,
                   qps=round(qps, 1), latency_ms=round(lat, 2),
                   recall_at_1=round(r1, 4), recall_at_10=round(r10, 4),
                   n_queries=B, dist_comps_per_query=dist_q, hops=0,
                   extra=dict(engine=engine, knob=knob,
                              timing=TIMING_MODE, **extra))
        results.append(row)
        log(f"  {engine:6s} {knob}={knob_val:<4} R@1={r1:.4f} "
            f"R@10={r10:.4f} QPS={qps:,.0f}")

    t0 = time.perf_counter()
    fused = FusedScanIndex(base, base_lo)
    log(f"fused build {time.perf_counter() - t0:.1f}s")
    for c in (12, 16, 32, 64):  # pool must cover k=10
        qps, lat, r1, r10 = timed(
            lambda c=c: fused.search(qj, qlo, k=10, c=c, merge="pallas"))
        record("fused", "c", c, qps, lat, r1, r10, merge="pallas")

    t0 = time.perf_counter()
    gated = GatedScanIndex(base, base_lo)
    log(f"gated build {time.perf_counter() - t0:.1f}s {gated.stats}")
    for p in (8, 16, 24, 32):
        qps, lat, r1, r10 = timed(
            lambda p=p: gated.search(qj, qlo, k=10, c=32, probes=p,
                                     merge="approx"))
        _, _, kept = gated.search(qj, qlo, k=10, c=32, probes=p,
                                  merge="approx", return_kept_frac=True)
        record("gated", "p", p, qps, lat, r1, r10, kept_cells=round(kept, 4))

    flat = FlatIndex(base, base_lo)
    for c in (16, 32):
        qps, lat, r1, r10 = timed(
            lambda c=c: flat.search(qj, qlo, k=10, c=c))
        record("flat", "c", c, qps, lat, r1, r10)

    t0 = time.perf_counter()
    ivf = IVFIndex.build(base, base_lo, seed=0)
    log(f"ivf build {time.perf_counter() - t0:.1f}s")
    for p in (8, 16, 32):
        qps, lat, r1, r10 = timed(
            lambda p=p: ivf.search(qj, qlo, k=10, c=32, probes=p))
        record("ivf", "p", p, qps, lat, r1, r10)

    graph_build_s = 0.0
    if not args.skip_graph:
        from gbnns_tpu.search.graph_index import GraphIndex

        t0 = time.perf_counter()
        gidx = GraphIndex.build(base, base_lo, K=32, ncent=4096,
                                build_kwargs=dict(backend="fused"))
        graph_build_s = time.perf_counter() - t0
        log(f"graph build {graph_build_s:.1f}s")
        # B=8192 is the walker's measured sweet spot (SURVEY §9.6)
        qh, qlh = qj[:8192], qlo[:8192]
        gth = gt[:8192]
        for ef in (32, 48, 64):
            def run(ef=ef):
                return gidx.search(qh, qlh, k=10, ef=ef)
            ids = jax.block_until_ready(run())[0]
            r1 = recall_at_k(np.asarray(ids), gth, 1)
            r10 = recall_at_k(np.asarray(ids), gth, 10)
            t0 = time.perf_counter()
            out = None
            for _ in range(5):
                out = run()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 5
            record("graph", "ef", ef, 8192 / dt, dt * 1e3, r1, r10,
                   batch=8192)

    summary = dict(
        name="sift1m_dr32_1m", dataset="sift1m-like (synthetic, offline)",
        n_base=n, dim=128, d_out=32, method="triplet-linear",
        n_queries=B, timing=TIMING_MODE,
        graph_build_s=round(graph_build_s, 1),
        results=results)
    out_path = pathlib.Path(args.out)
    out_path.write_text(json.dumps(summary, indent=2, allow_nan=False))
    try:
        from gbnns_tpu.eval.plot import plot_sweeps

        png = str(out_path).replace(".json", ".png")
        groups = {}
        for r in results:
            groups.setdefault(r["extra"]["engine"], []).append(r)
        plot_sweeps(groups, png,
                    title=f"1M x 128->32 learned: recall@10 vs QPS")
        log(f"wrote {png}")
    except Exception as e:
        log(f"plot failed: {e}")
    print(json.dumps(dict(rows=len(results), out=str(out_path))))


if __name__ == "__main__":
    main()
