"""Measure the cluster-gated scan vs the ungated fused scan at 1M on TPU.

Writes results/gated_1m.json: per-probes QPS / recall / kept-cell
fraction for GatedScanIndex, with FusedScanIndex as the in-process
baseline (same corpus, same projection, same batch).

Usage: python scripts/gated_1m.py [--n 1000000] [--b 16384]
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
    ap.add_argument("--tq", type=int, default=1024)
    ap.add_argument("--q-chunk", type=int, default=16384, dest="q_chunk")
    ap.add_argument("--ncent", type=int, default=0, help="0 = default")
    ap.add_argument("--fine", type=int, default=32)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--probes", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--out", default="results/gated_1m.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()
    import jax

    from gbnns_tpu.dimred.pca import pca_fit, pca_transform
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex
    from gbnns_tpu.search.gated import GatedScanIndex

    n, B = args.n, args.b
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    data = make_synthetic(SyntheticSpec(
        n_base=n, n_query=B, dim=args.d, n_clusters=max(64, n // 2000),
        seed=0))
    base, query = data["base"], data["query"]
    # PCA is corpus-statistics-bound, not n-bound: fit on <=1M rows (at
    # 10M a full fit cost 599s of H2D streaming, deep10m_single_chip.json)
    m = pca_fit(base[:: max(1, n // 1_000_000)], args.d_lo)
    base_lo = pca_transform(m, base)
    query_lo = pca_transform(m, query)
    gt = exact_ground_truth(query, base, k=10, q_chunk=args.q_chunk)
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
    if not args.skip_fused:
        t0 = time.perf_counter()
        fused = FusedScanIndex(base, base_lo)
        log(f"fused build {time.perf_counter() - t0:.1f}s")
        for c in (16, 32):
            qps, r1, r10 = timed(lambda c=c: fused.search(
                qj, qlo, k=10, c=c, merge="approx"))
            log(f"fused  c={c:3d}            R@10={r10:.4f} QPS={qps:,.0f}")
            rows.append(dict(engine="fused", c=c, qps=round(qps, 1),
                             r1=round(r1, 4), r10=round(r10, 4)))

    t0 = time.perf_counter()
    gated = GatedScanIndex(base, base_lo, ncent=args.ncent or None,
                           fine=args.fine, m=args.m, tq=args.tq)
    build_s = time.perf_counter() - t0
    log(f"gated build {build_s:.1f}s stats={gated.stats}")
    for p in args.probes:
        def run(p=p):
            return gated.search(qj, qlo, k=10, c=args.c, probes=p,
                                merge="approx")
        qps, r1, r10 = timed(run)
        _, _, kept = gated.search(qj, qlo, k=10, c=args.c, probes=p,
                                  merge="approx", return_kept_frac=True)
        log(f"gated  p={p:3d} kept={kept:.3f} R@10={r10:.4f} QPS={qps:,.0f}")
        rows.append(dict(engine="gated", probes=p, c=args.c,
                         kept_cells=round(kept, 4), qps=round(qps, 1),
                         r1=round(r1, 4), r10=round(r10, 4)))

    out = dict(n=n, B=B, projection=f"pca-{args.d}to{args.d_lo}",
               gated_stats=gated.stats, gated_build_s=round(build_s, 1),
               fine=args.fine, m=args.m, timing="pipelined", rows=rows)
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(rows, indent=0))


if __name__ == "__main__":
    main()
