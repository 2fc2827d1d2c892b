"""Headline benchmark — run on real TPU by the round driver.

Measures the BASELINE.json:5 headline AT CONTRACT SCALE: QPS at matched
recall@1/recall@10 on a SIFT1M-like corpus (n=1,000,000 by default) with a
triplet-learned 128→32-d linear projection + exact full-dim re-rank, using
the framework's engines for the hardware:

  * fused — Pallas binned scan (kernels/scan_topk_pallas.py): distances +
            candidate selection fused in VMEM, the TPU-native fast path
  * flat  — XLA MXU scan + approx top-k (search/flat.py)
  * ivf   — cluster-pruned scan (search/ivf.py)
  * graph — lockstep beam walker (reference-parity engine; adds a ~4-min
            1M exact graph build, enable with GBNNS_BENCH_GRAPH=1)

The projection is trained on a 262k-row subsample (positives = in-sample
exact NN) — projection quality is corpus-statistics-bound, not n-bound.

Baseline for ``vs_baseline``: 2x a single-H100-class graph-ANN engine at
recall@10≈0.95, taken as 2 x 100k QPS = 200k QPS (CAGRA-class magnitude
from PAPERS.md:7; the reference published no numbers — BASELINE.json:13).
The headline row requires R@10 >= 0.95. vs_baseline >= 1.0 means the
≥2x-H100 target is met at the contract scale.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "queries/s", "vs_baseline": ...}

Size knobs (env): GBNNS_BENCH_N (base size, default 1,000,000),
GBNNS_BENCH_Q (queries, default 16384), GBNNS_BENCH_STEPS (train steps),
GBNNS_BENCH_GRAPH=1 (also bench the graph walker), GBNNS_BENCH_CPU=1
(offline smoke mode).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import threading
import time

_src = str(pathlib.Path(__file__).resolve().parent / "src")
if _src not in sys.path:
    sys.path.insert(0, _src)


def main():
    t_start = time.perf_counter()
    import numpy as np

    # Fail fast if the relay is fully down (seen r3: 10+ h outage where
    # every process hangs inside backend init): exit 3 instead of hanging
    # to the caller's timeout. Normal warmup stalls are 20-320 s.
    init_timeout = float(os.environ.get("GBNNS_BENCH_INIT_TIMEOUT_S", 900))
    init_ok = threading.Event()

    def _watchdog():
        if not init_ok.wait(init_timeout):
            print(f"bench: backend init exceeded {init_timeout:.0f}s "
                  "(axon relay down?) — aborting", file=sys.stderr,
                  flush=True)
            os._exit(3)
    threading.Thread(target=_watchdog, daemon=True).start()

    # absorb the axon relay's first-transfer stall concurrently with setup
    def _warm():
        try:
            import jax.numpy as jnp
            np.asarray(jnp.zeros((1,), jnp.float32))
            init_ok.set()
        except Exception:
            pass
    threading.Thread(target=_warm, daemon=True).start()

    import jax
    if os.environ.get("GBNNS_BENCH_CPU"):  # offline smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gbnns_tpu.dimred.train import TrainConfig, project, train_projection
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex
    from gbnns_tpu.search.flat import FlatIndex
    from gbnns_tpu.search.ivf import IVFIndex

    n = int(os.environ.get("GBNNS_BENCH_N", 1_000_000))
    nq = int(os.environ.get("GBNNS_BENCH_Q", 16384))
    steps = int(os.environ.get("GBNNS_BENCH_STEPS", 600))
    d, d_lo, K = 128, 32, 32
    r10_gate = 0.95
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log(f"bench: n={n} nq={nq} d={d}->{d_lo} "
        f"backend={jax.default_backend()}")

    data = make_synthetic(SyntheticSpec(
        n_base=n, n_query=nq, dim=d, n_clusters=max(64, n // 2000), seed=0))
    base, query = data["base"], data["query"]

    # ---- learned projection (triplet, trained on a subsample) ---------
    # Cached across bench invocations keyed on the exact training inputs:
    # training dominated round-2 bench wall time (181-440 s of relay
    # compile variance for IDENTICAL code+data — VERDICT r2 item 10).
    from gbnns_tpu.dimred.train import load_projection, save_projection

    t0 = time.perf_counter()
    # _sel: round-5 recipe — validation-gated checkpoint selection
    # (TrainConfig.eval_every). The hinge recipe trains BELOW its own PCA
    # init on this corpus (recall@c=16 0.9912 -> 0.9768 at 1M,
    # results/train_recipe_ab_1m.json — no swept variant beat the init);
    # selection returns the best checkpoint INCLUDING the init, so the
    # learned projection is >= PCA by construction.
    cache = pathlib.Path(__file__).resolve().parent / "results" / (
        f"bench_proj_n{n}_d{d}x{d_lo}_s{steps}_sel_seed1.npz")
    trained = None
    if cache.exists() and not os.environ.get("GBNNS_BENCH_NO_CACHE"):
        try:
            trained = load_projection(str(cache))
            log(f"projection cache hit: {cache.name}")
        except Exception as e:
            log(f"projection cache unreadable ({e}); retraining")
    if trained is None:
        rng = np.random.default_rng(1)
        sub = rng.choice(n, size=min(262_144, n), replace=False)
        base_sub = base[sub]
        k_pos = min(10, base_sub.shape[0] - 1)
        train_nbrs = exact_ground_truth(base_sub, base_sub, k=k_pos + 1,
                                        q_chunk=16384)[:, 1:]
        trained = train_projection(base_sub, train_nbrs, TrainConfig(
            d_out=d_lo, steps=steps, batch_size=1024, k_pos=k_pos,
            eval_every=max(50, steps // 4)))
        log(f"projection best_step={trained.get('best_step')} "
            f"val@16={trained.get('best_val'):.4f} "
            f"(init {trained['val_history'][0]:.4f})")
        cache.parent.mkdir(exist_ok=True)
        save_projection(str(cache), trained)
    base_lo = np.asarray(project(trained, base))
    query_lo = np.asarray(project(trained, query))
    train_time = time.perf_counter() - t0
    log(f"projection train+apply: {train_time:.1f}s")

    # GT cached like the projection (exact, deterministic in (n, nq, seed))
    gt_cache = pathlib.Path(__file__).resolve().parent / "results" / (
        f"bench_gt_n{n}_q{nq}_seed0.npz")
    if gt_cache.exists() and not os.environ.get("GBNNS_BENCH_NO_CACHE"):
        gt = np.load(gt_cache)["gt"]
        log(f"gt cache hit: {gt_cache.name}")
    else:
        gt = exact_ground_truth(query, base, k=10, q_chunk=16384)
        np.savez_compressed(gt_cache, gt=gt)
    q_j = jnp.asarray(query)
    qlo_j = jnp.asarray(query_lo)

    def timed(run):
        ids = jax.block_until_ready(run())[0]
        r1 = recall_at_k(np.asarray(ids), gt, 1)
        r10 = recall_at_k(np.asarray(ids), gt, 10)
        # pipelined throughput: dispatch all iters, block once — blocking
        # each batch adds the ~26 ms relay round trip per batch, which
        # understated the 47 ms fused batch by ~1.8x (191k vs 346k QPS)
        iters = 5
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = run()
        jax.block_until_ready(out)
        return nq / ((time.perf_counter() - t0) / iters), r1, r10

    bests: dict[str, dict | None] = {}

    def consider(engine, knobs, qps, r1, r10):
        b = bests.get(engine)
        if r10 >= r10_gate and (b is None or qps > b["qps"]):
            bests[engine] = dict(engine=engine, qps=qps, r1=r1, r10=r10,
                                 **knobs)

    # ---- fused Pallas scan (flagship) ----------------------------------
    t0 = time.perf_counter()
    fused = FusedScanIndex(base, base_lo)
    fused_build = time.perf_counter() - t0
    # merge="pallas" (merge_topc over the scan's native bin-major layout):
    # 28.84 ms scan+merge at 1M x 16k vs 33.33 approx / 35.27 exact
    # (results/tail_decomp_1m.jsonl)
    # merge=None resolves to pallas on TPU, exact on the CPU smoke path.
    # c=12 joins the sweep in round 5: merge_topc extracts in rounds of 8
    # (c=12 costs the same merge as 16) but the re-rank pool shrinks 25%,
    # and with the selection-quality projection R@10@c=12 ~ 0.96 clears
    # the 0.95 gate at the curve's fastest point (468.9k QPS measured at
    # c=12 in results/sift1m_dr32_1m.json).
    for c in (12, 16, 32, 64):
        qps, r1, r10 = timed(lambda c=c: fused.search(q_j, qlo_j, k=10,
                                                      c=c, merge=None))
        log(f"  fused c={c:3d} R@1={r1:.4f} R@10={r10:.4f} QPS={qps:,.0f}")
        consider("fused", dict(c=c, merge="pallas|exact-cpu"), qps, r1, r10)
        if r10 >= 0.995:
            break

    # ---- fused scan + bf16 re-rank: the measured round-4 lever. int8 at
    # K=32 matched bf16 (results/int8_ab_1m.json) — the MXU-rate doubling
    # never materializes at a 32-deep contraction — but halving the
    # re-rank's candidate-row gather bytes bought +7% end-to-end
    # (471.7k vs 439.4k QPS at c=16, R@10 0.982). f32 re-rank stays the
    # default (reference-exact semantics); this row is the speed mode.
    if not os.environ.get("GBNNS_BENCH_CPU"):
        fused_rr = FusedScanIndex(base, base_lo, rerank_dtype=jnp.bfloat16)
        for c in (12, 16, 32):
            qps, r1, r10 = timed(
                lambda c=c: fused_rr.search(q_j, qlo_j, k=10, c=c,
                                            merge=None))
            log(f"  fused/bf16rr c={c:3d} R@1={r1:.4f} R@10={r10:.4f} "
                f"QPS={qps:,.0f}")
            consider("fused_bf16rr", dict(c=c, merge="pallas",
                                          rerank="bf16"), qps, r1, r10)
            if r10 >= 0.995:
                break

    # ---- fused scan, int8 corpus (2x MXU rate if Mosaic keeps the int8
    # path at K=32; per-query dequant preserves ranking, re-rank absorbs
    # rounding). Skipped in CPU smoke mode (interpret int8 adds nothing).
    if not os.environ.get("GBNNS_BENCH_CPU"):
        fused8 = FusedScanIndex(base, base_lo, scan_dtype="int8")
        for c in (16, 32, 64):
            qps, r1, r10 = timed(
                lambda c=c: fused8.search(q_j, qlo_j, k=10, c=c,
                                          merge=None))
            log(f"  fused8 c={c:3d} R@1={r1:.4f} R@10={r10:.4f} "
                f"QPS={qps:,.0f}")
            consider("fused_int8", dict(c=c, merge="pallas"), qps, r1, r10)
            if r10 >= 0.995:
                break

    # ---- int8 scan + bf16 re-rank: the exact combo the interleaved A/B
    # measured fastest (471.7k vs 439.4k QPS at c=16 —
    # results/int8_ab_1m.json). The two dtype savings are independent
    # (scan HBM reads vs re-rank gather bytes), so they compose.
    if not os.environ.get("GBNNS_BENCH_CPU"):
        fused8rr = FusedScanIndex(base, base_lo, scan_dtype="int8",
                                  rerank_dtype=jnp.bfloat16)
        for c in (12, 16, 32):
            qps, r1, r10 = timed(
                lambda c=c: fused8rr.search(q_j, qlo_j, k=10, c=c,
                                            merge=None))
            log(f"  fused8/bf16rr c={c:3d} R@1={r1:.4f} R@10={r10:.4f} "
                f"QPS={qps:,.0f}")
            consider("fused_int8_bf16rr", dict(c=c, merge="pallas",
                                               rerank="bf16"), qps, r1, r10)
            if r10 >= 0.995:
                break

    # ---- IVF cluster-pruned scan ---------------------------------------
    t0 = time.perf_counter()
    ivf = IVFIndex.build(base, base_lo, seed=0)
    ivf_build = time.perf_counter() - t0
    log(f"  ivf build {ivf_build:.1f}s {ivf.stats}")
    for probes in (8, 16, 32):
        qps, r1, r10 = timed(
            lambda p=probes: ivf.search(q_j, qlo_j, k=10, c=32, probes=p))
        log(f"  ivf p={probes:3d} R@1={r1:.4f} R@10={r10:.4f} QPS={qps:,.0f}")
        consider("ivf", dict(probes=probes, c=32), qps, r1, r10)
        if r10 >= 0.99:
            break

    # ---- XLA flat scan ---------------------------------------------------
    flat = FlatIndex(base, base_lo)
    for c in (16, 32):
        qps, r1, r10 = timed(lambda c=c: flat.search(q_j, qlo_j, k=10, c=c))
        log(f"  flat c={c:3d} R@1={r1:.4f} R@10={r10:.4f} QPS={qps:,.0f}")
        consider("flat", dict(c=c), qps, r1, r10)
        if r10 >= 0.995:
            break

    # ---- graph engine (DMA-payload walker + centroid entries) ----------
    # Off by default at 1M (the fused scan wins there and the reduced-space
    # graph build adds ~7 min); GBNNS_BENCH_GRAPH=1 opts in.
    build_time = 0.0
    if os.environ.get("GBNNS_BENCH_GRAPH") or n <= 200_000:
        from gbnns_tpu.search.graph_index import GraphIndex

        t0 = time.perf_counter()
        gidx = GraphIndex.build(
            base, base_lo, K=K, ncent=max(64, min(4096, n // 256)),
            # binned-scan build: 116s vs 384s at 1M, walker recall unchanged
            build_kwargs=dict(backend="fused") if n > 300_000 else None)
        build_time = time.perf_counter() - t0
        log(f"  graph build (reduced space + payload + centroids): "
            f"{build_time:.1f}s")
        for ef in (32, 48, 64, 96):
            qps, r1, r10 = timed(
                lambda ef=ef: gidx.search(q_j, qlo_j, k=10, ef=ef))
            log(f"  graph ef={ef:3d} R@1={r1:.4f} R@10={r10:.4f} "
                f"QPS={qps:,.0f}")
            consider("graph", dict(ef=ef), qps, r1, r10)
            if r10 >= 0.97:
                break

    # Headline = the API-default engine row (fused: bf16 scan + f32
    # re-rank). Round 4's full-bench honesty note measured all four
    # scan/re-rank dtype combos within the +-1.5% relay noise band at c=16
    # while int8+bf16rr costs ~0.8 recall points — quoting the combo as the
    # headline was cherry-picking inside noise (VERDICT r4 weak-1). The
    # dtype rows stay in engine_bests as sweep lines.
    best = bests.get("fused") or max(
        [b for b in bests.values() if b], key=lambda b: b["qps"],
        default=None)
    if best is None:
        best = dict(engine="none", qps=0.0, r1=0.0, r10=0.0)
    baseline_qps = 200_000.0
    out = {
        "metric": f"qps@r10>={r10_gate} sift-like-{n // 1000}k "
                  f"128d->32d-learned rerank",
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
        "recall_at_1": round(best.get("r1", 0.0), 4),
        "recall_at_10": round(best.get("r10", 0.0), 4),
        "engine_bests": {k: v for k, v in bests.items() if v},
        "n_base": n,
        "n_query": nq,
        "projection": "triplet-linear-128to32",
        "train_s": round(train_time, 1),
        "graph_build_s": round(build_time, 1),
        "total_bench_s": round(time.perf_counter() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
