"""IVF crossover study (VERDICT r2 item 8): find a config where the IVF
engine beats the fused scan, or record the demotion evidence.

Round-2 measurements had IVF losing everywhere it was tried (1M/16k:
45k vs 406k; 10M: 14.7k vs 52.5k). The three untested regimes where its
pruning could pay:
  * small serving batches (B in {256, 1024}) — the fused scan's cost per
    query is the FULL corpus regardless of B, while IVF's is ~probes
    buckets;
  * wider reduced dim (d'=96, the GloVe config geometry) — scan matmul
    and HBM cost scale with d', bucket gathers scale the same, but the
    scan's fixed selection cost is amortized worse;
  * larger corpus per HBM byte (bf16 10M) — covered by the DEEP10M
    artifact separately.

Writes results/ivf_crossover.json with fused/gated/ivf rows per (B, d').

Usage: python scripts/ivf_crossover.py [--n 1000000]
"""

from __future__ import annotations

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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--out", default="results/ivf_crossover.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()
    import jax

    from gbnns_tpu.dimred.pca import pca_fit, pca_transform
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex
    from gbnns_tpu.search.ivf import IVFIndex

    n = args.n
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    data = make_synthetic(SyntheticSpec(n_base=n, n_query=4096, dim=128,
                                        n_clusters=max(64, n // 2000),
                                        seed=0))
    base, query = data["base"], data["query"]
    gt = exact_ground_truth(query, base, k=10, q_chunk=16384)

    rows = []
    for d_lo in (32, 96):
        m = pca_fit(base, d_lo)
        base_lo = pca_transform(m, base)
        query_lo = pca_transform(m, query)
        fused = FusedScanIndex(base, base_lo)
        ivf = IVFIndex.build(base, base_lo, seed=0)
        from gbnns_tpu.search.gated import GatedScanIndex
        gated = GatedScanIndex(base, base_lo)
        for B in (256, 1024, 4096):
            qs, qls = jnp.asarray(query[:B]), jnp.asarray(query_lo[:B])
            gtb = gt[:B]

            def timed(run, iters=8):
                ids = jax.block_until_ready(run())[0]
                r10 = recall_at_k(np.asarray(ids), gtb, 10)
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = run()
                jax.block_until_ready(out)
                return B / ((time.perf_counter() - t0) / iters), r10

            for eng, run_fn, knobs in (
                ("fused", lambda c=16: fused.search(qs, qls, k=10, c=c,
                                                    merge="approx"),
                 dict(c=16)),
                ("ivf-p16", lambda: ivf.search(qs, qls, k=10, c=32,
                                               probes=16),
                 dict(probes=16, c=32)),
                ("ivf-p32", lambda: ivf.search(qs, qls, k=10, c=32,
                                               probes=32),
                 dict(probes=32, c=32)),
                ("gated-p16", lambda: gated.search(qs, qls, k=10, c=32,
                                                   probes=16,
                                                   merge="approx"),
                 dict(probes=16, c=32)),
                ("gated-p32", lambda: gated.search(qs, qls, k=10, c=32,
                                                   probes=32,
                                                   merge="approx"),
                 dict(probes=32, c=32)),
            ):
                qps, r10 = timed(run_fn)
                rows.append(dict(engine=eng, d_lo=d_lo, B=B,
                                 qps=round(qps, 1), r10=round(r10, 4),
                                 **knobs))
                log(f"d'={d_lo} B={B:5d} {eng:8s} R@10={r10:.4f} "
                    f"QPS={qps:,.0f}")

    # verdict: does IVF (or the gated scan) win any (d_lo, B) cell at
    # comparable recall?
    ivf_wins, gated_wins = [], []
    for d_lo in (32, 96):
        for B in (256, 1024, 4096):
            cell = [r for r in rows if r["d_lo"] == d_lo and r["B"] == B]
            f = next(r for r in cell if r["engine"] == "fused")
            for r in cell:
                if r["engine"] == "fused":
                    continue
                if r["qps"] > f["qps"] \
                        and r["r10"] >= min(0.95, f["r10"] - 0.01):
                    (gated_wins if r["engine"].startswith("gated")
                     else ivf_wins).append(r)
    out = dict(n=n, rows=rows, ivf_wins=ivf_wins, gated_wins=gated_wins,
               verdict=("ivf wins in listed cells" if ivf_wins else
                        "fused dominates IVF in every tested cell — IVF "
                        "stays a documented negative on single-chip TPU; "
                        "the gated scan is its TPU-native replacement"),
               timing="pipelined")
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(dict(ivf_wins=len(ivf_wins), gated_wins=len(gated_wins))))


if __name__ == "__main__":
    main()
