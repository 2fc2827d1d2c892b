"""Establish the mechanism behind the int8-at-10M scan win (SURVEY §12.10).

`results/deep10m_dtype_decomp.json` measured the int8 SCAN alone at +6.0%
over bf16 at 10M, while the 1M interleaved A/B (§11.1) measured a wash —
and per-batch corpus bytes are trivial against HBM bandwidth at both
scales, so simple bandwidth starvation is ruled out. The surviving
hypothesis: per-cell corpus-tile LOAD LATENCY matters once the scan's
grid is long (10M/16384 = 611 corpus chunks vs 62 at 1M) — half-size int8
tiles shorten the per-cell load the MXU stream must hide at each chunk
boundary.

This run tests that hypothesis at n=1M by sweeping the chunk size:

    chunk 16384 / bin 1024 ->  62 corpus chunks (1M default, "wash" regime)
    chunk  8192 / bin 1024 -> 123 corpus chunks
    chunk  2048 / bin  256 -> 489 corpus chunks (the 10M default's 611)

x {bf16, int8} scan dtype, f32 re-rank everywhere (isolate the scan
lever), interleaved in one process so relay drift cancels. Corpus shape
matches the 10M study (d=96 -> PCA 32) so per-row bytes are identical.
Mosaic requires chunk/bin_size >= 8 (the scan's output block is
(n_bins_per_chunk, tq)), so the 489-chunk cell shrinks bin_size with the
chunk; that changes the candidate pool (and merge cost) of that PAIR,
but the mechanism readout is the int8-vs-bf16 delta WITHIN each pair,
which stays controlled.

If int8's advantage appears at 1M as the grid lengthens, the load-latency
mechanism is confirmed; if not, the 10M effect is tied to corpus size
itself (e.g. HBM page locality), not grid length.

Writes results/chunk_mechanism_1m.json.

Usage: python scripts/chunk_mechanism_ab.py [--n 1000000]
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
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cells", type=str, nargs="+",
                    metavar="CHUNK:BIN",
                    default=["16384:1024", "8192:1024", "2048:256"])
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

    # one f32 re-rank corpus shared by every index (the stub-build trick
    # from deep10m_dtype_decomp.py: scan corpora are per-chunk-padded and
    # cheap, the 384 MB full-dim corpus is not)
    cells_cfg = [tuple(int(v) for v in s.split(":")) for s in args.cells]
    t0 = time.perf_counter()
    ref = FusedScanIndex(base, base_lo, chunk=cells_cfg[0][0],
                         bin_size=cells_cfg[0][1])
    log(f"ref build {time.perf_counter() - t0:.1f}s")
    idxs, combos = {}, []
    for ch, bs in cells_cfg:
        for dt in ("bf16", "int8"):
            name = f"{dt}_c{ch}b{bs}"
            combos.append(name)
            if (ch, bs) == cells_cfg[0] and dt == "bf16":
                idxs[name] = ref
                continue
            kw = dict(scan_dtype="int8") if dt == "int8" else {}
            idx = FusedScanIndex(base[:1024], base_lo, chunk=ch,
                                 bin_size=bs, **kw)
            idx.base_full, idx.base_sq = ref.base_full, ref.base_sq
            idxs[name] = idx

    cells = {name: [] for name in combos}
    recall, n_cells = {}, {}
    for name in combos:
        idx = idxs[name]
        n_cells[name] = int(np.ceil(n / idx.chunk))
        ids = np.asarray(jax.block_until_ready(
            idx.search(qj, qlo_j, k=10, c=c))[0])
        recall[name] = dict(r1=round(float(recall_at_k(ids, gt, 1)), 4),
                            r10=round(float(recall_at_k(ids, gt, 10)), 4))
    for r in range(args.rounds):
        for name in combos:
            idx = idxs[name]
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = idx.search(qj, qlo_j, k=10, c=c)
            jax.block_until_ready(out)
            qps = B / ((time.perf_counter() - t0) / args.iters)
            cells[name].append(round(qps, 1))
            log(f"  round {r} {name:12s} ({n_cells[name]:4d} chunks): "
                f"{qps:,.0f}")

    rows = [dict(combo=name, n_corpus_chunks=n_cells[name],
                 qps_rounds=cells[name],
                 qps_median=sorted(cells[name])[len(cells[name]) // 2],
                 **recall[name]) for name in combos]
    out = dict(n=n, B=B, c=c, rounds=args.rounds, iters=args.iters,
               projection="pca-96to32", rerank="f32 everywhere",
               timing="pipelined-interleaved", rows=rows,
               question="does the int8 scan advantage at 10M (611 corpus "
                        "chunks; deep10m_dtype_decomp +6.0%) reproduce at "
                        "1M when chunk size shrinks to match the grid "
                        "length? yes -> per-cell tile-load latency is the "
                        "mechanism; no -> corpus size itself")
    tag = f"{n // 1_000_000}m" if n % 1_000_000 == 0 else str(n)
    (_root / "results" / f"chunk_mechanism_{tag}.json").write_text(
        json.dumps(out, indent=2, allow_nan=False))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
