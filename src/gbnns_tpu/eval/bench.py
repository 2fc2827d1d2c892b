"""QPS benchmarking and recall-vs-QPS sweeps.

Capability parity: the reference's timing loop + ef sweep producing the
recall-vs-QPS curve (SURVEY.md §4.3, BASELINE.json:2 — the primary metric).
TPU-specific methodology (SURVEY §7.3 "QPS methodology"): the whole query
batch is resident on device, timed end-to-end around ``block_until_ready``
after warmup (first call compiles; compile time excluded), so QPS reflects
steady-state device throughput exactly as the reference's OpenMP wall-clock
over the query set does. Distance-computation counters come from the walker
itself for apples-to-apples work accounting.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Callable

import jax
import numpy as np

# QPS timing definition used by time_search since round 2: all iterations
# dispatched, one block at the end. Stamped into BenchResult.extra by the
# sweep drivers so cross-round comparisons know which methodology made
# each number (round-1 artifacts used "blocked": block every batch).
TIMING_MODE = "pipelined"


@dataclasses.dataclass
class BenchResult:
    label: str
    ef: int
    qps: float
    latency_ms: float          # per-batch wall time
    recall_at_1: float
    recall_at_10: float
    n_queries: int
    dist_comps_per_query: float
    hops: int
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)

    def to_json(self) -> dict[str, Any]:
        # Strict-JSON guarantee: non-finite floats (unknown / data-dependent
        # work counts, recall without GT) serialize as null, never as the
        # literal NaN/Infinity tokens that break non-Python consumers
        # (VERDICT r3: jq choked on results/sift1m_dr32_1m.json).
        def clean(v):
            if isinstance(v, float) and not np.isfinite(v):
                return None
            if isinstance(v, dict):
                return {k: clean(x) for k, x in v.items()}
            return v
        return {k: clean(v) for k, v in dataclasses.asdict(self).items()}


def time_fn(fn: Callable[[], Any], *, warmup: int = 2, iters: int = 5) -> tuple[float, Any]:
    """Median wall-clock seconds of ``fn`` (which must return jax arrays or
    pytrees thereof; ``block_until_ready`` is applied to the result)."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def time_search(search_fn: Callable[[], Any], n_queries: int, *,
                warmup: int = 2, iters: int = 5) -> tuple[float, float, Any]:
    """Returns (qps, seconds_per_batch_latency, last_result).

    QPS is measured PIPELINED — all iterations dispatched, one
    block_until_ready at the end — the production serving pattern where
    the next batch is enqueued while the current one runs. Blocking every
    batch (the latency number, still reported) adds the host↔device
    round trip to each batch: ~26 ms on this relay, which understates a
    ~50 ms device batch's throughput by ~1.8x (measured round 2: the same
    fused scan read 191k QPS blocked vs 346k pipelined)."""
    sec_lat, _ = time_fn(search_fn, warmup=warmup, iters=max(2, iters // 2))
    # NOTE comparability: numbers produced before round 2 used the
    # per-batch-blocked definition (what latency_ms still reports), ~1.8x
    # lower for ~50 ms batches on this relay. Callers stamp
    # extra["timing"] = TIMING_MODE so artifacts record which definition
    # produced each QPS figure (ADVICE r2).
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = search_fn()
    jax.block_until_ready(out)
    sec_thr = (time.perf_counter() - t0) / iters
    return n_queries / sec_thr, sec_lat, out


def sweep(run_one: Callable[[int], BenchResult], efs: list[int],
          *, out_path: str | None = None, verbose: bool = True) -> list[BenchResult]:
    """Run ``run_one(ef)`` for each ef; collect the recall-vs-QPS curve and
    optionally persist structured JSON results (SURVEY §5.5)."""
    results = []
    for ef in efs:
        r = run_one(ef)
        results.append(r)
        if verbose:
            dq = r.dist_comps_per_query
            dq_s = f"{dq:,.0f}" if dq is not None and np.isfinite(dq) else "-"
            print(f"  ef={ef:4d}  R@1={r.recall_at_1:.4f}  R@10={r.recall_at_10:.4f}  "
                  f"QPS={r.qps:,.0f}  dist/q={dq_s}  hops={r.hops}",
                  flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump([r.to_json() for r in results], f, indent=2,
                      allow_nan=False)
    return results


def pareto(results: list[BenchResult], recall_attr: str = "recall_at_10") -> list[BenchResult]:
    """Points on the recall-vs-QPS Pareto frontier (higher is better on both)."""
    pts = sorted(results, key=lambda r: -r.qps)
    frontier, best_recall = [], -1.0
    for r in pts:
        rec = getattr(r, recall_attr)
        if rec > best_recall:
            frontier.append(r)
            best_recall = rec
    return frontier
