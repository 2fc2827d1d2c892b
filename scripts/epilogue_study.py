"""Fused-scan selection-epilogue study (VERDICT r2 item 1).

The round-2 headline engine (kernels/scan_topk_pallas.binned_scan) runs a
1M x 16k batch in ~40 ms of which only ~3.5 ms is the score matmul at the
296 TFLOP/s dense rate — the rest is the VPU selection epilogue (~5 ops
over every one of the 1.6e10 scores) plus whatever the d'=32 contraction
really costs on a 128-deep MXU. This script measures, one variant per
process (axon relay rule: perf variants never share a process), where the
time actually goes and which epilogue formulation is fastest:

  matmul_only   floor probe: bins loop + matmul, epilogue replaced by one
                row copy — the load-pipeline + MXU cost at d'=32
  min_only      floor probe: matmul + f32 min per bin, no argmin — adds
                exactly one VPU reduction pass
  packed        the shipping kernel: IEEE sign-flip int32 key, index in
                low mantissa bits, one integer min pass
  packed_nojit_flip  packed but with qshift (scores>=0, no sign flip)
  bf16_min      scores cast to bf16 (packed vregs, 2 lanes/word), bf16
                min pass, argmin recovered by an equality pass + iota min
  bf16_key      bf16 scores bitcast to int16, index packed in the low
                mantissa bits, ONE int16 min pass (half the vreg traffic
                of `packed`); score resolution 7-log2(bin)/... bits
  + bin_size / tq / chunk sweeps of the best formulation

Usage:  python scripts/epilogue_study.py VARIANT [--n 1000000] [--b 16384]
        prints one JSON line and appends to results/epilogue_study_1m.jsonl
Driver: scripts/run_epilogue_study.sh runs the full matrix.

Each timed variant is also cross-checked against an XLA f32 oracle on a
small slice: the returned winner's recomputed score must match the true
bin minimum to the variant's quantization tolerance.
"""

from __future__ import annotations

import argparse
import functools
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


def build_kernel(mode: str, n_bins_c: int, bin_size: int, prescaled=True):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    idx_bits = int(np.log2(bin_size))
    mask = (1 << idx_bits) - 1

    def kernel(q_ref, x_ref, add_ref, val_ref, idx_ref):
        jj = pl.program_id(0)
        q = q_ref[:]
        cn = x_ref.shape[0]
        base_col = jj * cn
        for b in range(n_bins_c):
            xb = x_ref[b * bin_size:(b + 1) * bin_size, :]
            dots = jax.lax.dot_general(
                xb, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (BIN, TQ)
            addb = add_ref[0, b * bin_size:(b + 1) * bin_size]
            if mode == "matmul_only":
                # consume dots with a single-row write: epilogue ~ free
                val_ref[b, :] = dots[0, :]
                idx_ref[b, :] = jnp.full_like(dots[0, :], base_col,
                                              dtype=jnp.int32)
                continue
            scores = addb[:, None] + dots if prescaled else \
                addb[:, None] - 2.0 * dots
            if mode == "min_only":
                val_ref[b, :] = jnp.min(scores, axis=0)
                idx_ref[b, :] = jnp.full((scores.shape[1],), base_col,
                                         jnp.int32)
            elif mode == "packed":
                bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
                okey = jnp.where(bits < 0, bits ^ 0x7FFFFFFF, bits)
                iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
                pkey = (okey & ~mask) | iota
                pmin = jnp.min(pkey, axis=0)
                obits = pmin & ~mask
                vbits = jnp.where(obits < 0, obits ^ 0x7FFFFFFF, obits)
                val_ref[b, :] = jax.lax.bitcast_convert_type(vbits,
                                                             jnp.float32)
                idx_ref[b, :] = (pmin & mask) + (base_col + b * bin_size)
            elif mode == "argmin":
                # the pre-round-2 formulation: separate min + argmin
                pos = jnp.argmin(scores, axis=0).astype(jnp.int32)
                val_ref[b, :] = jnp.min(scores, axis=0)
                idx_ref[b, :] = pos + (base_col + b * bin_size)
            elif mode == "bf16_min":
                s16 = scores.astype(jnp.bfloat16)
                vmin = jnp.min(s16, axis=0)
                eq = s16 == vmin[None, :]
                iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
                pos = jnp.min(jnp.where(eq, iota, bin_size), axis=0)
                val_ref[b, :] = vmin.astype(jnp.float32)
                idx_ref[b, :] = pos + (base_col + b * bin_size)
            elif mode == "bf16_key":
                # bf16 score bits hold sign+exp+7-bit mantissa; replace the
                # low idx16 mantissa bits with the in-bin row index and do
                # ONE int16 min pass over packed 16-bit vregs. Needs
                # scores >= 0 for unsigned-order correctness -> the L2
                # addvec (||x||^2 - 2qx + missing ||q||^2 can be negative)
                # is handled by the same sign-flip trick in 16 bits.
                idx16 = idx_bits - 4  # pack bin/16 coarse index only
                m16 = (1 << idx16) - 1
                s16 = scores.astype(jnp.bfloat16)
                bits = jax.lax.bitcast_convert_type(s16, jnp.int16)
                okey = jnp.where(bits < 0, bits ^ jnp.int16(0x7FFF), bits)
                iota = jax.lax.broadcasted_iota(
                    jnp.int16, scores.shape, 0) >> 4
                pkey = (okey & jnp.int16(~m16)) | iota
                pmin = jnp.min(pkey, axis=0)
                # coarse position: winner known to within 16 rows; recover
                # the exact row with one masked eq pass over those 16 rows
                # is skipped — candidate id resolution to 16 rows means the
                # RE-RANK pool must take all 16 (c *= 16) — study probe
                # only, records the timing headroom of true 16-bit keys.
                obits = pmin & jnp.int16(~m16)
                vb = jnp.where(obits < 0, obits ^ jnp.int16(0x7FFF), obits)
                val_ref[b, :] = jax.lax.bitcast_convert_type(
                    vb, jnp.bfloat16).astype(jnp.float32)
                idx_ref[b, :] = ((pmin & jnp.int16(m16)).astype(jnp.int32)
                                 << 4) + (base_col + b * bin_size)
            else:
                raise ValueError(mode)

    return kernel


def run_variant(mode: str, *, n: int, B: int, d: int, bin_size: int,
                chunk: int, tq: int, iters: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(seed)
    n_pad = -(-n // chunk) * chunk
    x = rng.standard_normal((n_pad, d), dtype=np.float32)
    x[n:] = 0.0
    add = (x ** 2).sum(-1)
    add[n:] = np.inf
    xs = jnp.asarray(-2.0 * x, jnp.bfloat16)          # prescaled l2
    addv = jnp.asarray(add).reshape(1, n_pad)
    q = jnp.asarray(rng.standard_normal((B, d), dtype=np.float32))

    n_chunks = n_pad // chunk
    n_bins_c = chunk // bin_size
    n_bins = n_pad // bin_size
    Bp = -(-B // tq) * tq
    qp = jnp.pad(q, ((0, Bp - B), (0, 0))).astype(xs.dtype)
    b_tiles = Bp // tq

    kernel = build_kernel(mode, n_bins_c, bin_size)

    @jax.jit
    def scan(qp, xs, addv):
        return pl.pallas_call(
            kernel,
            grid=(n_chunks, b_tiles),
            in_specs=[
                pl.BlockSpec((tq, d), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, d), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_bins_c, tq), lambda j, i: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_bins_c, tq), lambda j, i: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_bins, Bp), jnp.float32),
                jax.ShapeDtypeStruct((n_bins, Bp), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * n_pad * d,
                bytes_accessed=n_pad * d * 2 * b_tiles + Bp * n_bins * 8,
                transcendentals=0),
            interpret=interpret,
        )(qp, xs, addv)

    vals, ids = jax.block_until_ready(scan(qp, xs, addv))

    # ---- correctness cross-check (not for floor probes) ----------------
    check = "skipped"
    if mode not in ("matmul_only", "min_only"):
        nb_check, q_check = 4, 64
        xb = xs[:nb_check * bin_size].astype(jnp.float32)
        dots = qp[:q_check].astype(jnp.float32) @ xb.T      # (q, rows)
        sc = addv[0, :nb_check * bin_size][None, :] + dots
        sc = np.asarray(sc).reshape(q_check, nb_check, bin_size)
        ref_min = sc.min(-1)                                 # (q, nb)
        got_ids = np.asarray(ids)[:nb_check, :q_check].T     # (q, nb)
        got_rows = got_ids - np.arange(nb_check)[None, :] * bin_size
        got_sc = np.take_along_axis(sc, got_rows[:, :, None],
                                    axis=2)[:, :, 0]
        tol = 1e-3 if mode in ("packed", "argmin") else 2e-2
        err = np.abs(got_sc - ref_min) / np.maximum(1.0, np.abs(ref_min))
        # bf16_key resolves winners to 16-row groups: score-only check
        check = "ok" if float(err.max()) < tol else f"FAIL {err.max():.4f}"

    # ---- timing: pipelined, one block ---------------------------------
    for _ in range(2):
        out = scan(qp, xs, addv)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = scan(qp, xs, addv)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dict(mode=mode, n=n, B=B, d=d, bin_size=bin_size, chunk=chunk,
                tq=tq, ms_per_batch=round(dt * 1e3, 2),
                scan_qps=round(B / dt, 1), n_bins=n_bins, check=check,
                backend=jax.default_backend())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=16384)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--bin", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--tq", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="results/epilogue_study_1m.jsonl")
    args = ap.parse_args()

    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()
    res = run_variant(args.mode, n=args.n, B=args.b, d=args.d,
                      bin_size=args.bin, chunk=args.chunk, tq=args.tq,
                      iters=args.iters)
    line = json.dumps(res)
    print(line, flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
