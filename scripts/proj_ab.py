"""Projection A/B at contract scale: d'=64 depth + MLP vs linear
(VERDICT r4 items 4 and 5).

Two open levers on the fused scan's structural d'=32 matmul floor
(SURVEY §10.1: a 32-deep contraction uses ~20% of the 128-deep MXU):

  * depth — d'=64 doubles the matmul work but also doubles the MXU
    contraction efficiency, and better pre-re-rank recall may buy a
    smaller c: triplet-64 vs triplet-32, QPS at matched R@10.
  * nonlinearity — the reference's "small MLP" variant (SURVEY §3
    dim-red nets) has never been run at 1M: if it lifts recall@c=16 even
    half a point it moves the headline.

Every variant trains on the SAME 262k subsample with the SAME recipe as
bench.py (caches shared where identical), then runs through
FusedScanIndex with an interleaved c sweep — each (c, variant) cell is
measured adjacent in time so relay drift (~±1.5%) cancels across
variants.

Writes (sift corpus): results/depth_ab_1m.json + results/mlp_ab_1m.json
       (glove corpus): results/mlp_ab_glove.json

Usage: python scripts/proj_ab.py [--corpus sift|glove] [--n 1000000]
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
    ap.add_argument("--corpus", default="sift", choices=["sift", "glove"])
    ap.add_argument("--n", type=int, default=0, help="0 = corpus default")
    ap.add_argument("--nq", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=0, help="0 = corpus default")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()

    from gbnns_tpu.dimred.train import (TrainConfig, load_projection,
                                        project, save_projection,
                                        train_projection)
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex

    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    if args.corpus == "sift":
        n = args.n or 1_000_000
        d, metric, steps = 128, "l2", args.steps or 600
        lr, neg_ranks = 1e-3, None
        variants = [("linear32", "linear", 32), ("linear64", "linear", 64),
                    ("mlp32", "mlp", 32)]
    else:
        n = args.n or 1_183_514
        d, metric, steps = 300, "angular", args.steps or 3000
        lr, neg_ranks = 1e-4, (10, 100)
        variants = [("linear96", "linear", 96), ("mlp96", "mlp", 96)]

    data = make_synthetic(SyntheticSpec(
        n_base=n, n_query=args.nq, dim=d, metric=metric,
        n_clusters=max(64, n // 2000), seed=0))
    base, query = data["base"], data["query"]

    res_dir = _root / "results"
    res_dir.mkdir(exist_ok=True)
    gt_cache = res_dir / (f"bench_gt_n{n}_q{args.nq}_seed0.npz"
                          if args.corpus == "sift"
                          else f"ab_gt_glove_n{n}_q{args.nq}.npz")
    if gt_cache.exists():
        gt = np.load(gt_cache)["gt"]
        log(f"gt cache hit: {gt_cache.name}")
    else:
        gt = exact_ground_truth(query, base, k=10, q_chunk=16384,
                                metric=metric)
        np.savez_compressed(gt_cache, gt=gt)

    # shared training supervision: one subsample, one exact-NN set
    rng = np.random.default_rng(1)
    sub = rng.choice(n, size=min(262_144, n), replace=False)
    base_sub = base[sub]
    k_sup = 10 if neg_ranks is None else max(10, neg_ranks[1])
    nbr_cache = res_dir / f"ab_nbrs_{args.corpus}_n{n}_k{k_sup}.npz"
    if nbr_cache.exists():
        train_nbrs = np.load(nbr_cache)["nbrs"]
    else:
        train_nbrs = exact_ground_truth(base_sub, base_sub, k=k_sup + 1,
                                        q_chunk=16384, metric=metric)[:, 1:]
        np.savez_compressed(nbr_cache, nbrs=train_nbrs)

    q_j = jnp.asarray(query)
    indexes, rows = {}, {}
    for name, model, d_out in variants:
        cache = res_dir / (
            f"bench_proj_n{n}_d{d}x{d_out}_s{steps}_seed1.npz"
            if (args.corpus == "sift" and model == "linear" and d_out == 32)
            else f"ab_proj_{args.corpus}_{name}_n{n}_s{steps}.npz")
        t0 = time.perf_counter()
        trained = None
        if cache.exists():
            try:
                trained = load_projection(str(cache))
                log(f"{name}: projection cache hit ({cache.name})")
            except Exception as e:
                log(f"{name}: cache unreadable ({e}); retraining")
        if trained is None:
            trained = train_projection(base_sub, train_nbrs, TrainConfig(
                d_out=d_out, model=model, metric=metric, steps=steps,
                batch_size=1024, k_pos=10, lr=lr, neg_ranks=neg_ranks))
            save_projection(str(cache), trained)
        train_s = time.perf_counter() - t0
        base_lo = np.asarray(project(trained, base))
        qlo = jnp.asarray(np.asarray(project(trained, query)))
        idx = FusedScanIndex(base, base_lo, metric=metric)
        indexes[name] = (idx, qlo)
        rows[name] = dict(variant=name, model=model, d_out=d_out,
                          train_s=round(train_s, 1), cells=[])
        log(f"{name}: d'={d_out} model={model} train {train_s:.1f}s")

    def timed(run):
        ids = jax.block_until_ready(run())[0]
        r1 = recall_at_k(np.asarray(ids), gt, 1)
        r10 = recall_at_k(np.asarray(ids), gt, 10)
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        return args.nq / dt, dt * 1e3, r1, r10

    # interleaved sweep: all variants measured adjacent per c
    # (c must be >= k=10 for the exact re-rank)
    for c in (16, 32, 64):
        for name, _, _ in variants:
            idx, qlo = indexes[name]
            qps, ms, r1, r10 = timed(
                lambda idx=idx, qlo=qlo, c=c: idx.search(
                    q_j, qlo, k=10, c=c, merge=None))
            rows[name]["cells"].append(dict(
                c=c, qps=round(qps, 1), ms_per_batch=round(ms, 2),
                r1=round(float(r1), 4), r10=round(float(r10), 4)))
            log(f"  {name} c={c:3d}: {qps:,.0f} QPS R@10={r10:.4f}")

    # matched-recall table: best QPS among cells meeting each gate
    gates = (0.95, 0.97, 0.99)
    matched = {}
    for g in gates:
        matched[str(g)] = {
            name: (max((c_["qps"] for c_ in rows[name]["cells"]
                        if c_["r10"] >= g), default=None))
            for name, _, _ in variants}
    out = dict(corpus=args.corpus, n=n, d=d, metric=metric, nq=args.nq,
               steps=steps, variants=list(rows.values()),
               qps_at_matched_r10=matched,
               note="interleaved c sweep per variant (relay drift cancels "
                    "across variants within a c); matched-recall cells are "
                    "best QPS among swept c meeting the R@10 gate; None = "
                    "gate unreachable within the sweep")
    if args.corpus == "sift":
        depth = dict(out)
        depth["question"] = ("does d'=64 (2x matmul work, 2x MXU "
                             "contraction efficiency, better recall@c) "
                             "beat d'=32 at matched R@10? SURVEY §10.1")
        (res_dir / "depth_ab_1m.json").write_text(
            json.dumps(depth, indent=2, allow_nan=False))
        mlp = dict(out)
        mlp["question"] = ("does the reference's small-MLP projection "
                           "lift recall@c / end QPS over linear at "
                           "contract scale? SURVEY §3 dim-red nets")
        (res_dir / "mlp_ab_1m.json").write_text(
            json.dumps(mlp, indent=2, allow_nan=False))
        print(json.dumps(dict(out_depth="results/depth_ab_1m.json",
                              out_mlp="results/mlp_ab_1m.json",
                              matched=matched)))
    else:
        (res_dir / "mlp_ab_glove.json").write_text(
            json.dumps(out, indent=2, allow_nan=False))
        print(json.dumps(dict(out="results/mlp_ab_glove.json",
                              matched=matched)))


if __name__ == "__main__":
    main()
