"""Fast on-device correctness gates for paths that are interpret-tested
only (round 4): catches Mosaic-lowering failures the CPU interpreter hides,
BEFORE the long measurement queue spends an hour on them.

Checks (n=20k, ~2-4 min incl. compiles):
  1. merge_topc large pools (the round-4 rb-raise path: c=300 -> rb=1024)
     vs the exact transpose+top_k merge — id-set equality;
  2. FusedScanIndex c=300 end-to-end on the pallas merge;
  3. int8 scan vs bf16 scan — recall parity after re-rank;
  4. beam_search_pallas(visited_mode='exact') vs walker_jax exact —
     bit-identical pools on device;
  5. fused graph-build backend (binned_scan + merge_topc on TPU).

Writes one JSON line: {"ok": bool, "checks": {...}}. Exit 1 on any fail.

Usage: python scripts/tpu_selfcheck.py [--cpu]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=20_000)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    if not args.cpu:
        threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                         daemon=True).start()

    from gbnns_tpu.build.knn_graph import build_knn_graph
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import (FusedScanIndex,
                                                    merge_topc)
    from gbnns_tpu.search.walker_jax import beam_search, default_entry_ids
    from gbnns_tpu.search.walker_pallas import (beam_search_pallas,
                                                pack_hop_payload)

    interp = jax.default_backend() != "tpu"
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    checks = {}
    t_all = time.perf_counter()

    data = make_synthetic(SyntheticSpec(n_base=args.n, n_query=256, dim=32,
                                        n_clusters=64, seed=0))
    base, query = data["base"], data["query"]
    gt = exact_ground_truth(query, base, k=10)

    # 1. merge_topc rb-raise path vs exact merge
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((640, 256)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 100000, (640, 256)).astype(np.int32))
    _, got = merge_topc(vals, ids, 300, valid_b=256, interpret=interp)
    ref_sel = np.argsort(np.asarray(vals), axis=0, kind="stable")[:300].T
    ref_ids = np.take_along_axis(np.asarray(ids).T, ref_sel, axis=1)
    same = all(set(np.asarray(got)[q].tolist()) == set(ref_ids[q].tolist())
               for q in range(256))
    checks["merge_topc_rb1024"] = bool(same)
    log(f"1 merge_topc rb-raise: {same}")

    # 2. FusedScanIndex end-to-end at c=300 (pallas merge)
    fi = FusedScanIndex(base)
    fids, _ = fi.search(query, k=10, c=300, merge="pallas")
    r = recall_at_k(np.asarray(fids), gt, 10)
    checks["fused_c300_r10"] = round(float(r), 4)
    checks["fused_c300_ok"] = bool(r >= 0.95)
    log(f"2 fused c=300: R@10={r:.4f}")

    # 3. int8 scan recall parity
    fi8 = FusedScanIndex(base, scan_dtype="int8")
    iids, _ = fi8.search(query, k=10, c=64)
    bids, _ = fi.search(query, k=10, c=64)
    r8 = recall_at_k(np.asarray(iids), gt, 10)
    rb_ = recall_at_k(np.asarray(bids), gt, 10)
    checks["int8_r10"] = round(float(r8), 4)
    checks["int8_ok"] = bool(r8 >= rb_ - 0.01)
    log(f"3 int8: R@10={r8:.4f} vs bf16 {rb_:.4f}")

    # 4. pallas exact-visited vs jax exact: bit parity on device
    g = build_knn_graph(base, 16)
    e = default_entry_ids(args.n, 8)
    pl = pack_hop_payload(g, base, vec_dtype="float32")
    jr = beam_search(jnp.asarray(query), jnp.asarray(base), jnp.asarray(g),
                     e, ef=32, max_hops=128, visited_mode="exact", expand=1)
    pr = beam_search_pallas(query, pl, base, e, ef=32, max_hops=128,
                            visited_mode="exact", expand=1)
    bit = bool((np.asarray(jr.ids) == np.asarray(pr.ids)).all()
               and (np.asarray(jr.n_dist) == np.asarray(pr.n_dist)).all())
    checks["pallas_exact_bitparity"] = bit
    log(f"4 pallas exact bit-parity: {bit}")

    # 5. fused graph build backend (merge_topc path on TPU)
    t0 = time.perf_counter()
    gf = build_knn_graph(base, 16, backend="fused")
    checks["fused_build_s"] = round(time.perf_counter() - t0, 2)
    ov = float((gf[:, :, None] == g[:, None, :]).any(-1).mean())
    checks["fused_build_overlap"] = round(ov, 4)
    checks["fused_build_ok"] = bool(ov >= 0.5)  # symmetrize/repair differ
    log(f"5 fused build: {checks['fused_build_s']}s overlap={ov:.4f}")

    ok = all(v for k, v in checks.items() if k.endswith(("_ok", "parity",
                                                         "rb1024")))
    print(json.dumps(dict(ok=ok, backend=jax.default_backend(),
                          wall_s=round(time.perf_counter() - t_all, 1),
                          checks=checks)))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
