"""Kernel-level operating map for gated_topm_scan at 1M: ms vs (kept, tq).

Random Bernoulli tile masks (pessimistic for load elision vs the real
sorted-query masks). One (kept, tq) point per run to respect the relay;
the driver shell loops. Appends JSON lines to
results/gated_kernel_probe.jsonl.
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=16384)
    ap.add_argument("--tq", type=int, default=1024)
    ap.add_argument("--kept", type=float, default=1.0)
    ap.add_argument("--fine", type=int, default=32)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="results/gated_kernel_probe.jsonl")
    args = ap.parse_args()

    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()
    import jax

    from gbnns_tpu.kernels.scan_topk_pallas import gated_topm_scan

    rng = np.random.default_rng(0)
    d = 32
    n_pad = -(-args.n // args.chunk) * args.chunk
    x = rng.standard_normal((n_pad, d), dtype=np.float32)
    add = (x ** 2).sum(-1)
    add[args.n:] = np.inf
    xs = jnp.asarray(-2.0 * x, jnp.bfloat16)
    addv = jnp.asarray(add)
    Bp = -(-args.b // args.tq) * args.tq
    q = jnp.asarray(rng.standard_normal((Bp, d), dtype=np.float32))
    n_chunks = n_pad // args.chunk
    b_tiles = Bp // args.tq
    mask = jnp.asarray(
        (rng.random(n_chunks * b_tiles) < args.kept).astype(np.int32))

    def run():
        return gated_topm_scan(q, xs, addv, mask, metric="l2",
                               fine=args.fine, m=args.m, chunk=args.chunk,
                               tq=args.tq)

    jax.block_until_ready(run())
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    res = dict(n=args.n, B=args.b, tq=args.tq,
               kept=round(float(np.asarray(mask).mean()), 3),
               fine=args.fine, m=args.m, chunk=args.chunk,
               ms=round(dt * 1e3, 2), eff_qps=round(args.b / dt, 1))
    print(json.dumps(res), flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
