"""Refresh the 1M kNN-graph build-time row on TPU (VERDICT r3 item 7).

The BASELINE.md row "exact 1M 384 s / fused 116 s" is a round-2
measurement; the fused backend has since been rewired onto `merge_topc`
(the pallas top-c extraction) and was interpret-tested only until the
round-4 on-device self-check. This script times both backends at the
bench's own contract-scale corpus (1M x 128 -> 32d learned projection,
K=32) and records candidate overlap of fused vs exact, writing
results/build_time_1m.json.

Usage: python scripts/build_time_1m.py [--n 1000000] [--k 32]
       [--skip-exact]
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


def overlap(g, g_ref):
    hits = sum(len(np.intersect1d(a, b, assume_unique=False))
               for a, b in zip(g[::997], g_ref[::997]))
    return hits / (g[::997].shape[0] * g.shape[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--out", default="results/build_time_1m.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()

    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.dimred.train import load_projection, project
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    n = args.n
    data = make_synthetic(SyntheticSpec(n_base=n, n_query=128, dim=128,
                                        n_clusters=max(64, n // 2000),
                                        seed=0))
    base = data["base"]
    cache = _root / "results" / f"bench_proj_n{n}_d128x32_s600_seed1.npz"
    if cache.exists():
        base_lo = np.asarray(project(load_projection(str(cache)), base))
        proj = "triplet-linear-128to32 (bench cache)"
    else:  # fall back to raw 32 leading dims — timing is d'-bound only
        base_lo = np.ascontiguousarray(base[:, :32])
        proj = "first-32-dims (no projection cache)"
    log(f"corpus {base_lo.shape} K={args.k} ({proj})")

    rows = {}
    t0 = time.perf_counter()
    g_fused = build_knn_graph(base_lo, args.k, backend="fused", verbose=True)
    rows["fused_s"] = round(time.perf_counter() - t0, 1)
    log(f"fused build: {rows['fused_s']}s")

    if not args.skip_exact:
        t0 = time.perf_counter()
        g_exact = build_knn_graph(base_lo, args.k, backend="xla", exact=True,
                                  verbose=True)
        rows["xla_exact_s"] = round(time.perf_counter() - t0, 1)
        rows["fused_overlap_vs_exact"] = round(overlap(g_fused, g_exact), 4)
        log(f"exact build: {rows['xla_exact_s']}s "
            f"overlap={rows['fused_overlap_vs_exact']}")

    out = dict(n=n, d_lo=int(base_lo.shape[1]), k=args.k, projection=proj,
               note="fused backend rides binned_scan + merge_topc (the "
                    "round-4 pallas top-c path) on device; timings include "
                    "per-process jit compile, symmetrize + reachability "
                    "repair included (same pipeline as bench/GraphIndex)",
               **rows)
    print(json.dumps(out))
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
