"""Config-5 scale evidence: sharded FUSED engine at n=2M over 8 virtual devices.

VERDICT r2 missing item 5: the DEEP10M sharded config's virtual-mesh
evidence stopped at n=262k. This script runs the per-shard fused Pallas
binned scan (interpret mode on the forced-CPU mesh — the same program
that runs compiled on a real v4-8/v5e slice) at n=2,000,000 x 96d:

  * exact ground truth via a chunked numpy sweep (512 queries),
  * a SINGLE-DEVICE run of the same corpus (FusedScanIndex, the
    single-chip flagship engine) as the parity reference,
  * the 8-way sharded run (build_sharded_index(with_graph=False) +
    sharded_search(engine="fused")) at ef in {32, 64},
  * asserted recall parity: |R@10(sharded) - R@10(single)| <= 0.01 and
    sharded R@10 >= 0.95 at ef=64.

Writes results/deep10m_v4-8_s0.2_cpu8.json. CPU wall time is recorded
but is NOT a throughput claim (1-core host, interpret-mode kernels);
the artifact's claim is program correctness + recall at scale.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/sharded_2m_cpu8.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

_src = str(pathlib.Path(__file__).resolve().parents[1] / "src")
if _src not in sys.path:
    sys.path.insert(0, _src)

import numpy as np  # noqa: E402


def exact_gt(query: np.ndarray, base: np.ndarray, k: int,
             chunk: int = 131072) -> np.ndarray:
    """Chunked exact L2 top-k, numpy (the oracle must not share kernels
    with the engines under test)."""
    nq = query.shape[0]
    best_d = np.full((nq, k), np.inf, np.float32)
    best_i = np.full((nq, k), -1, np.int64)
    qsq = (query ** 2).sum(-1, keepdims=True)
    for s in range(0, base.shape[0], chunk):
        xb = base[s:s + chunk]
        d2 = qsq + (xb ** 2).sum(-1)[None, :] - 2.0 * (query @ xb.T)
        m = min(k, xb.shape[0])
        part = np.argpartition(d2, m - 1, axis=1)[:, :m]
        pd = np.take_along_axis(d2, part, axis=1)
        cat_d = np.concatenate([best_d, pd], axis=1)
        cat_i = np.concatenate([best_i, part + s], axis=1)
        sel = np.argsort(cat_d, axis=1, kind="stable")[:, :k]
        best_d = np.take_along_axis(cat_d, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
    return best_i


def main():
    n, nq, k = 2_000_000, 512, 10
    out_path = "results/deep10m_v4-8_s0.2_cpu8.json"

    import jax

    # the axon site-module overrides JAX_PLATFORMS at import time; the
    # config update is what actually sticks (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, jax.devices()

    from gbnns_tpu.eval.recall import recall_at_k
    from gbnns_tpu.io.datasets import load_dataset
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex
    from gbnns_tpu.search.sharded import (build_sharded_index, make_mesh,
                                          sharded_search)

    print(f"[2m-cpu8] generating deep10m scale=0.2 (n={n})", flush=True)
    ds = load_dataset("deep10m", scale=0.2)
    base, query = ds.base, ds.query[:nq]
    assert base.shape == (n, 96), base.shape

    t0 = time.perf_counter()
    gt = exact_gt(query, base, k)
    t_gt = time.perf_counter() - t0
    print(f"[2m-cpu8] exact GT in {t_gt:.1f}s", flush=True)

    # ---- single-device reference: the single-chip flagship engine ----
    t0 = time.perf_counter()
    idx1 = FusedScanIndex(base, metric="l2")
    ids1, _ = idx1.search(query, k=k, c=64)
    r10_single = float(recall_at_k(np.asarray(ids1), gt, k))
    t_single = time.perf_counter() - t0
    print(f"[2m-cpu8] single-device fused R@10={r10_single:.4f} "
          f"({t_single:.1f}s)", flush=True)
    del idx1, ids1

    # ---- 8-way sharded run -------------------------------------------
    mesh = make_mesh(8)
    t0 = time.perf_counter()
    idx = build_sharded_index(base, 8, mesh, with_graph=False)
    t_build = time.perf_counter() - t0
    rows = []
    for ef in (32, 64):
        t0 = time.perf_counter()
        ids, dists = sharded_search(idx, query, k, ef=ef, engine="fused")
        ids = np.asarray(ids)
        dt = time.perf_counter() - t0
        r10 = float(recall_at_k(ids, gt, k))
        r1 = float(recall_at_k(ids[:, :1], gt[:, :1], 1))
        assert (np.diff(np.asarray(dists), axis=1) >= -1e-5).all()
        assert (ids < n).all() and (ids >= 0).all(), "sentinel leaked"
        rows.append({"engine": "sharded-fused", "ef": ef, "n_devices": 8,
                     "recall_at_1": r1, "recall_at_10": r10,
                     "wall_s_cpu_interpret": round(dt, 1)})
        print(f"[2m-cpu8] sharded ef={ef} R@1={r1:.4f} R@10={r10:.4f} "
              f"({dt:.1f}s)", flush=True)

    r10_sharded = rows[-1]["recall_at_10"]
    assert abs(r10_sharded - r10_single) <= 0.01, (r10_sharded, r10_single)
    assert r10_sharded >= 0.95, r10_sharded

    out = {
        "name": "deep10m_v4-8_s0.2_cpu8",
        "note": ("Sharded fused Pallas scan at n=2M over an 8-device "
                 "forced-CPU mesh (interpret-mode kernels; the identical "
                 "shard_map program runs compiled on a real slice). "
                 "Claim is correctness + recall parity with the "
                 "single-device engine at scale, NOT throughput "
                 "(1-core host). VERDICT r2 item 5."),
        "n_base": n, "n_query": nq, "dim": 96, "metric": "l2",
        "gt_s": round(t_gt, 1),
        "single_device": {"engine": "FusedScanIndex", "c": 64,
                          "recall_at_10": r10_single,
                          "wall_s_cpu_interpret": round(t_single, 1)},
        "sharded_build_s": round(t_build, 1),
        "rows": rows,
        "parity": {"abs_delta_r10": abs(r10_sharded - r10_single),
                   "gate": "<= 0.01", "gate_pass": True},
    }
    pathlib.Path("results").mkdir(exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[2m-cpu8] wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
