"""Fused-engine TAIL decomposition (round 3 continuation).

The epilogue study (results/epilogue_study_1m.md) pinned the SCAN at
28.2 ms/batch (1M x 16k, argmin mode) against a ~27.6 ms MXU output-rate
floor — but the full FusedScanIndex.search batch is ~39.7 ms (412k QPS).
This script measures where the remaining ~11.5 ms goes, one variant per
process (axon relay rule):

  scan          binned_scan only (reproduces the study floor)
  merge_exact   scan + transpose + lax.top_k(c) + take_along_axis
  merge_approx  scan + transpose + lax.approx_max_k(c) + take
  full_exact    merge_exact + full-dim re-rank       (whole engine)
  full_approx   merge_approx + full-dim re-rank      (the 412k headline)
  rerank        re-rank alone on FIXED random candidate ids — isolates the
                (B, c, 128) gather + exact-distance cost
  merge_pallas / full_pallas
                the round-3 Pallas top-c merge kernel (kernels/
                scan_topk_pallas.merge_topc): consumes the scan's
                bin-major (n_bins, B) winners directly — no transpose,
                packed-key min-extract rounds in VMEM

Usage: python scripts/tail_decomp.py VARIANT [--n ...] [--b ...] [--c 16]
Appends one JSON line to results/tail_decomp_1m.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
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
    ap.add_argument("variant")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=16384)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--dlo", type=int, default=32)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="results/tail_decomp_1m.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()

    from gbnns_tpu.kernels.scan_topk_pallas import (FusedScanIndex,
                                                    binned_scan, merge_topc)
    from gbnns_tpu.search.rerank import rerank

    rng = np.random.default_rng(0)
    n, B, d, d_lo, c = args.n, args.b, args.d, args.dlo, args.c
    base = rng.standard_normal((n, d), dtype=np.float32)
    w = rng.standard_normal((d, d_lo)).astype(np.float32) / np.sqrt(d)
    base_lo = base @ w
    q = rng.standard_normal((B, d), dtype=np.float32)
    q_j = jnp.asarray(q)
    qlo_j = jnp.asarray(q @ w)

    idx = FusedScanIndex(base, base_lo)
    kw = dict(metric=idx.metric, bin_size=idx.bin_size, chunk=idx.chunk,
              tq=idx.tq, interpret=idx.interpret, packed=idx.packed,
              prescaled=True)

    variant = args.variant

    if variant == "scan":
        def run(ql):
            return binned_scan(ql, idx.x_lo, idx.addvec, **kw)
    elif variant in ("merge_exact", "merge_approx", "full_exact",
                     "full_approx"):
        approx = variant.endswith("approx")
        full = variant.startswith("full")

        def run(ql):
            vals, ids = binned_scan(ql, idx.x_lo, idx.addvec, **kw)
            if approx:
                _, sel = jax.lax.approx_max_k(-vals, c, recall_target=0.95)
            else:
                _, sel = jax.lax.top_k(-vals, c)
            cand = jnp.take_along_axis(ids, sel, axis=1)
            if full:
                return rerank(q_j, idx.base_full, cand, 10,
                              base_sqnorms=idx.base_sq)
            return cand
    elif variant in ("merge_pallas", "full_pallas"):
        full = variant.startswith("full")

        def run(ql):
            vals, ids = binned_scan(ql, idx.x_lo, idx.addvec,
                                    transpose=False, **kw)
            cand_v, cand = merge_topc(vals, ids, c, valid_b=B,
                                      interpret=idx.interpret)
            if full:
                return rerank(q_j, idx.base_full, cand, 10,
                              base_sqnorms=idx.base_sq)
            return cand
    elif variant == "rerank":
        cand_fixed = jnp.asarray(
            rng.integers(0, n, size=(B, c)).astype(np.int32))

        def run(ql):
            return rerank(q_j, idx.base_full, cand_fixed, 10,
                          base_sqnorms=idx.base_sq)
    else:
        raise SystemExit(f"unknown variant {variant}")

    jrun = jax.jit(run)
    out = jax.block_until_ready(jrun(qlo_j))
    for _ in range(2):
        out = jrun(qlo_j)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = jrun(qlo_j)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters

    res = dict(variant=variant, n=n, B=B, d=d, d_lo=d_lo, c=c,
               ms_per_batch=round(dt * 1e3, 2), qps=round(B / dt, 1),
               backend=jax.default_backend())
    line = json.dumps(res)
    print(line, flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
