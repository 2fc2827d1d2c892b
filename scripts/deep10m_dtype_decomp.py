"""Attribute the 10M dtype-combo win: int8 scan vs bf16 re-rank.

`results/deep10m_refresh_r5.json` measured int8-scan + bf16-re-rank at
+9.4% over the default (bf16 scan + f32 re-rank) at 10M, where the 1M
interleaved A/B (§11.1) measured all four combos inside noise. This run
holds everything else fixed and sweeps the two levers independently at
c=16, interleaved in one process so relay drift cancels:

    bf16 / f32rr   (API default)      int8 / f32rr
    bf16 / bf16rr                     int8 / bf16rr

Writes results/deep10m_dtype_decomp.json.

Usage: python scripts/deep10m_dtype_decomp.py [--n 10000000]
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
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()

    from gbnns_tpu.dimred.pca import pca_fit, pca_transform
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex

    n, B, c = args.n, args.b, args.c
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    data = make_synthetic(SyntheticSpec(
        n_base=n, n_query=B, dim=96, n_clusters=max(64, n // 2000), seed=0))
    base, query = data["base"], data["query"]
    m = pca_fit(base[:: max(1, n // 1_000_000)], 32)
    base_lo = pca_transform(m, base)
    qlo = pca_transform(m, query)
    t0 = time.perf_counter()
    gt = exact_ground_truth(query, base, k=10, q_chunk=16384)
    log(f"gt {time.perf_counter() - t0:.1f}s")
    qj, qlo_j = jnp.asarray(query), jnp.asarray(qlo)

    combos = [
        ("bf16_f32rr", dict()),
        ("int8_f32rr", dict(scan_dtype="int8")),
        ("bf16_bf16rr", dict(rerank_dtype=jnp.bfloat16)),
        ("int8_bf16rr", dict(scan_dtype="int8", rerank_dtype=jnp.bfloat16)),
    ]
    # Build WITHOUT ever holding duplicate 10M corpora (a naive 4-index
    # build OOM'd: 2x f32 + 2x bf16 re-rank corpora + 4 scan corpora
    # exceeds 16 GB): the int8 index is constructed against a tiny
    # corpus stub and patched to share the f32 re-rank arrays; the two
    # bf16-re-rank variants are shallow copies sharing ONE on-device
    # bf16 cast (no extra host upload).
    import copy

    t0 = time.perf_counter()
    idx_b = FusedScanIndex(base, base_lo)
    log(f"bf16_f32rr: build {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    idx_i = FusedScanIndex(base[:1024], base_lo, scan_dtype="int8")
    idx_i.base_full = idx_b.base_full
    idx_i.base_sq = idx_b.base_sq
    log(f"int8_f32rr: build {time.perf_counter() - t0:.1f}s")
    bf16_corpus = idx_b.base_full.astype(jnp.bfloat16)
    idx_brr = copy.copy(idx_b)
    idx_brr.base_full = bf16_corpus
    idx_irr = copy.copy(idx_i)
    idx_irr.base_full = bf16_corpus
    idxs = {"bf16_f32rr": idx_b, "int8_f32rr": idx_i,
            "bf16_bf16rr": idx_brr, "int8_bf16rr": idx_irr}

    # interleave rounds so relay drift hits every combo equally
    cells = {name: [] for name, _ in combos}
    recall = {}
    for name, _ in combos:
        ids = np.asarray(jax.block_until_ready(
            idxs[name].search(qj, qlo_j, k=10, c=c, merge=None))[0])
        recall[name] = dict(r1=round(float(recall_at_k(ids, gt, 1)), 4),
                            r10=round(float(recall_at_k(ids, gt, 10)), 4))
    for r in range(args.rounds):
        for name, _ in combos:
            idx = idxs[name]
            run = lambda: idx.search(qj, qlo_j, k=10, c=c, merge=None)
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = run()
            jax.block_until_ready(out)
            qps = B / ((time.perf_counter() - t0) / args.iters)
            cells[name].append(round(qps, 1))
            log(f"  round {r} {name:12s}: {qps:,.0f}")

    rows = [dict(combo=name, qps_rounds=cells[name],
                 qps_median=sorted(cells[name])[len(cells[name]) // 2],
                 **recall[name]) for name, _ in combos]
    out = dict(n=n, B=B, c=c, rounds=args.rounds, iters=args.iters,
               projection="pca-96to32", timing="pipelined-interleaved",
               rows=rows,
               question="which dtype lever carries the +9.4% combo win at "
                        "10M (deep10m_refresh_r5) — the int8 scan or the "
                        "bf16 re-rank gather?")
    (_root / "results" / "deep10m_dtype_decomp.json").write_text(
        json.dumps(out, indent=2, allow_nan=False))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
