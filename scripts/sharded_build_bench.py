"""Sharded index build: parallel (one shard_map program) vs serial
(per-shard device sweeps) — VERDICT r3 item 9's scaling note.

Real-multichip caveat: this environment exposes ONE physical TPU chip, so
the mesh here is the 8-virtual-device CPU mesh (same code path the driver's
dryrun exercises). CPU wall-clock is not hardware-meaningful in absolute
terms, but the STRUCTURE is what scales: the serial path issues Pn
independent device sweeps (each O((n/Pn)²·d)) plus Pn host post-processing
passes in sequence, while the parallel path issues ONE program in which
every device sweeps its own shard concurrently and the host passes are
threaded. On a real v4-8 the program's sweep time is ~1/Pn of the serial
path's by construction (each chip sweeps only its shard, all at once).

Writes results/sharded_build_scaling.json.

Usage: python scripts/sharded_build_bench.py [--n 131072] [--d 32]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

_root = pathlib.Path(__file__).resolve().parents[1]
_src = str(_root / "src")
if _src not in sys.path:
    sys.path.insert(0, _src)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131_072)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default="results/sharded_build_scaling.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from gbnns_tpu.eval.recall import recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.search.sharded import (build_sharded_index, make_mesh,
                                          sharded_search)

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    data = make_synthetic(SyntheticSpec(
        n_base=args.n, n_query=256, dim=args.d,
        n_clusters=max(32, args.n // 2000), seed=0))
    base, query = data["base"], data["query"]
    d2 = None
    mesh = make_mesh(args.devices)

    rows = {}
    for mode, flag in (("parallel", True), ("serial", False)):
        t0 = time.perf_counter()
        idx = build_sharded_index(base, args.k, mesh, parallel_build=flag,
                                  build_kwargs=dict(node_chunk=4096))
        dt = time.perf_counter() - t0
        ids, _ = sharded_search(idx, query, 10, ef=32)
        if d2 is None:
            d2 = ((query[:, None, :].astype(np.float64)
                   - base[None, :, :]) ** 2).sum(-1)
            gt = np.argsort(d2, axis=1, kind="stable")[:, :10].astype(np.int32)
        r10 = recall_at_k(np.asarray(ids), gt, 10)
        rows[mode] = dict(build_s=round(dt, 2), r10=round(float(r10), 4))
        log(f"{mode}: build {dt:.2f}s search R@10={r10:.4f}")

    out = dict(n=args.n, d=args.d, k=args.k, devices=args.devices,
               mesh="8-virtual-CPU (one physical TPU chip in this env)",
               interpretation=(
                   "virtual devices share one host core, so wall-clock "
                   "parity here is expected; the structural difference is "
                   "what scales: the serial path runs every shard's "
                   "O((n/P)^2 d) sweep on the DEFAULT device only (P-1 "
                   "chips idle) while the parallel path is one shard_map "
                   "program with each device sweeping its own shard "
                   "concurrently - device-time per chip drops P-fold on a "
                   "real mesh"),
               wall_ratio_serial_over_parallel=round(
                   rows["serial"]["build_s"]
                   / max(rows["parallel"]["build_s"], 1e-9), 2),
               **rows)
    p = pathlib.Path(args.out)
    p.parent.mkdir(exist_ok=True)
    p.write_text(json.dumps(out, indent=2, allow_nan=False))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
