"""DEEP10M-scale single-chip refresh on the round-4 default engine.

The BASELINE.md 10M row (61,835 QPS @ R@10 0.9635, c=16) was measured in
round 3 with merge="approx"; the default engine now rides the pallas
top-c merge and the scan/re-rank dtype knobs exist. This refresh sweeps
the fused engine at 10M x 96 -> 32d PCA with merge=None (pallas on TPU)
in bf16/f32, plus the int8-scan + bf16-re-rank combo, writing
results/deep10m_refresh_r5.json (the r4 run never landed — relay outage).

Usage: python scripts/deep10m_refresh.py [--n 10000000] [--b 16384]
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
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--b", type=int, default=16384)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--d-lo", type=int, default=32, dest="d_lo")
    ap.add_argument("--out", default="results/deep10m_refresh_r5.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()
    import jax

    from gbnns_tpu.dimred.pca import pca_fit, pca_transform
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex

    n, B = args.n, args.b
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    data = make_synthetic(SyntheticSpec(
        n_base=n, n_query=B, dim=args.d, n_clusters=max(64, n // 2000),
        seed=0))
    base, query = data["base"], data["query"]
    # PCA is corpus-statistics-bound, not n-bound (see gated_1m.py)
    m = pca_fit(base[:: max(1, n // 1_000_000)], args.d_lo)
    base_lo = pca_transform(m, base)
    query_lo = pca_transform(m, query)
    t0 = time.perf_counter()
    gt = exact_ground_truth(query, base, k=10, q_chunk=16384)
    log(f"gt {time.perf_counter() - t0:.1f}s")
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
        return B / ((time.perf_counter() - t0) / iters), r1, r10

    rows = []

    def sweep(tag, idx, cs=(12, 16, 32)):
        for c in cs:
            qps, r1, r10 = timed(lambda c=c: idx.search(
                qj, qlo, k=10, c=c, merge=None))
            log(f"{tag:16s} c={c:3d} R@1={r1:.4f} R@10={r10:.4f} "
                f"QPS={qps:,.0f}")
            rows.append(dict(engine=tag, c=c, merge="pallas",
                             qps=round(qps, 1), r1=round(r1, 4),
                             r10=round(r10, 4)))
            if r10 >= 0.995:
                break

    t0 = time.perf_counter()
    fused = FusedScanIndex(base, base_lo)
    log(f"fused build {time.perf_counter() - t0:.1f}s")
    sweep("fused", fused)
    del fused
    t0 = time.perf_counter()
    fused8rr = FusedScanIndex(base, base_lo, scan_dtype="int8",
                              rerank_dtype=jnp.bfloat16)
    log(f"fused8rr build {time.perf_counter() - t0:.1f}s")
    sweep("fused_int8_bf16rr", fused8rr)

    out = dict(n=n, B=B, projection=f"pca-{args.d}to{args.d_lo}",
               timing="pipelined",
               note="round-4 refresh of the 10M single-chip row on the "
                    "pallas top-c merge (round 3: 61,835 QPS @ 0.9635 "
                    "c=16 with merge='approx'); int8 scan + bf16 re-rank "
                    "is the bench's fastest 1M combo, swept here for the "
                    "10M picture",
               rows=rows)
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
