"""int8 vs bf16 fused-scan A/B at contract scale (one process, few execs).

The fused kernel is matmul-bound at d_lo=32 (epilogue_study_1m.jsonl), and
the bf16 matmul runs at ~20% of the v5e MXU — consistent with a 32-deep
contraction on the 128-deep array. int8 doubles the MXU's per-pass rate
(394 TOPS vs 197 TFLOPS) IF Mosaic keeps the int8 path at K=32. This
script answers that empirically: end-to-end QPS (scan + pallas merge +
exact re-rank) and R@10 for scan_dtype in {bf16, int8} on a 1M synthetic
corpus with a PCA 128->32 projection.

Writes results/int8_ab_1m.json.
Usage: python scripts/int8_ab.py [--n 1000000] [--b 16384]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--b", type=int, default=16384)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--d-lo", type=int, default=32, dest="d_lo")
    ap.add_argument("--nq-recall", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="results/int8_ab_1m.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()

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
    m = pca_fit(base[:: max(1, n // 1_000_000)], args.d_lo)
    base_lo = pca_transform(m, base)
    query_lo = pca_transform(m, query)
    nr = args.nq_recall
    gt = exact_ground_truth(query[:nr], base, k=10, q_chunk=nr)
    qj, qlo = jnp.asarray(query), jnp.asarray(query_lo)
    qr, qlor = jnp.asarray(query[:nr]), jnp.asarray(query_lo[:nr])

    rows = []
    for dtype_name, dt, rr in (("bf16", jnp.bfloat16, jnp.float32),
                               ("int8", "int8", jnp.float32),
                               ("int8+bf16rr", "int8", jnp.bfloat16)):
        t0 = time.perf_counter()
        idx = FusedScanIndex(base, base_lo, scan_dtype=dt, rerank_dtype=rr)
        build_s = time.perf_counter() - t0
        for c in (16, 32):
            run = lambda c=c: idx.search(qj, qlo, k=10, c=c, merge="pallas")
            out = jax.block_until_ready(run())
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = run()
            jax.block_until_ready(o)
            dt_s = (time.perf_counter() - t0) / args.iters
            ids_r, _ = idx.search(qr, qlor, k=10, c=c, merge="pallas")
            r1 = recall_at_k(np.asarray(ids_r), gt, 1)
            r10 = recall_at_k(np.asarray(ids_r), gt, 10)
            row = dict(dtype=dtype_name, c=c, qps=round(B / dt_s, 1),
                       ms_per_batch=round(dt_s * 1e3, 2),
                       r1=round(r1, 4), r10=round(r10, 4),
                       build_s=round(build_s, 1))
            log(row)
            rows.append(row)

    out = dict(n=n, B=B, projection=f"pca-{args.d}to{args.d_lo}",
               recall_queries=nr, timing="pipelined",
               backend=jax.default_backend(), rows=rows)
    p = pathlib.Path(args.out)
    p.parent.mkdir(exist_ok=True)
    p.write_text(json.dumps(out, indent=2))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
