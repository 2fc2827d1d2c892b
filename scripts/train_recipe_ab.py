"""Training-recipe A/B at contract scale: candidate recall@c per recipe.

Motivation (round 5): the bench headline is gated at R@10 >= 0.95 and the
default sift recipe (600 steps, uniform negatives + in-batch hard
negatives) measures R@10 = 0.977 at c=16 — there is recall headroom BELOW
c=16 that the bench sweep never looked at. Questions, per corpus:

  sift (l2, Gaussian-like): do stronger recipes — longer schedules,
     graph-mined negatives, bigger batches — buy recall at small c?
     ANSWERED (first run): no — every hinge variant lands BELOW its own
     PCA init at c<=16 (PCA is the linear optimum there); gentle
     close-rank negatives tie it; uniform-only negatives collapse.
     That finding drove TrainConfig.eval_every checkpoint selection.
  glove (angular): the reference's premise is that LEARNED beats PCA on
     real-world angular corpora — measure the PCA/triplet gap in the
     regime where training should win, and confirm selection (sel3000)
     never does worse than the plain recipe.

Method: every variant trains on the SAME 262k subsample/supervision
(caches shared with bench.py / proj_ab.py where identical); candidate
recall@c comes from ``FusedScanIndex.candidates`` + GT-overlap, which
equals post-re-rank R@10 exactly (the re-rank is exact, candidates are
duplicate-free bin winners) — no per-variant full-dim corpus upload.
QPS per c is projection-independent (same shapes/dtypes) and is measured
once on the control index with the real full-dim re-rank.

Writes results/train_recipe_ab_1m.json (sift) /
       results/train_recipe_ab_glove.json (glove).

Usage: python scripts/train_recipe_ab.py [--corpus sift|glove]
       [--variants a,b] [--cs 10,12,16]
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

# name -> TrainConfig overrides (steps=0 means PCA-only)
SIFT_VARIANTS = {
    "pca": dict(steps=0),
    "ctrl600": dict(steps=600),                      # bench.py recipe
    "s2400": dict(steps=2400),
    "nr2400": dict(steps=2400, neg_ranks=(10, 100)),  # graph-mined negs
    "nrc2400": dict(steps=2400, neg_ranks=(10, 30)),  # closest non-pos negs
    "b4096": dict(steps=2400, batch_size=4096),
    # Phase-2 variants (first run showed every trained variant BELOW its
    # own PCA init at c<=16 — probe what in the recipe damages it):
    "nohn": dict(steps=2400, hard_negatives=False),
    "nrc_lo": dict(steps=2400, neg_ranks=(10, 30), lr=1e-4),
    "pca_ft": dict(steps=1200, neg_ranks=(10, 30), lr=1e-4, margin=0.1),
}
GLOVE_VARIANTS = {
    "pca": dict(steps=0),
    # the configs/glove_triplet.json recipe (cache shared with proj_ab.py)
    "ctrl3000": dict(steps=3000, neg_ranks=(10, 100), lr=1e-4),
    # same + validation-gated checkpoint selection: must be >= max(pca
    # ordering at init, ctrl3000) by construction — the structural gate
    "sel3000": dict(steps=3000, neg_ranks=(10, 100), lr=1e-4,
                    eval_every=500),
    # uniform negatives at the same budget: isolates the neg_ranks value
    # on the angular corpus (the reference's known-weak regime)
    "uniform3000": dict(steps=3000, lr=1e-4),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="sift", choices=["sift", "glove"])
    ap.add_argument("--n", type=int, default=0, help="0 = corpus default")
    ap.add_argument("--nq", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--variants", default="")
    ap.add_argument("--cs", default="10,12,16,24,32")
    args = ap.parse_args()
    cs = tuple(int(c) for c in args.cs.split(","))

    import jax
    import jax.numpy as jnp
    threading.Thread(target=lambda: np.asarray(jnp.zeros(1)),
                     daemon=True).start()

    from gbnns_tpu.dimred.pca import pca_fit
    from gbnns_tpu.dimred.train import (TrainConfig, load_projection,
                                        project, save_projection,
                                        train_projection)
    from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k
    from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic
    from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    nq = args.nq
    if args.corpus == "sift":
        n = args.n or 1_000_000
        d, d_lo, metric = 128, 32, "l2"
        variants_all, ctrl_name, base_lr = SIFT_VARIANTS, "ctrl600", 1e-3
    else:
        n = args.n or 1_183_514
        d, d_lo, metric = 300, 96, "angular"
        variants_all, ctrl_name, base_lr = GLOVE_VARIANTS, "ctrl3000", 1e-3
    names = [v for v in (args.variants.split(",") if args.variants
                         else variants_all) if v]

    data = make_synthetic(SyntheticSpec(
        n_base=n, n_query=nq, dim=d, metric=metric,
        n_clusters=max(64, n // 2000), seed=0))
    base, query = data["base"], data["query"]

    res_dir = _root / "results"
    res_dir.mkdir(exist_ok=True)
    gt_cache = res_dir / (f"bench_gt_n{n}_q{nq}_seed0.npz"
                          if args.corpus == "sift"
                          else f"ab_gt_glove_n{n}_q{nq}.npz")
    if gt_cache.exists():
        gt = np.load(gt_cache)["gt"]
        log(f"gt cache hit: {gt_cache.name}")
    else:
        gt = exact_ground_truth(query, base, k=10, q_chunk=16384,
                                metric=metric)
        np.savez_compressed(gt_cache, gt=gt)

    # shared supervision: one subsample, exact-NN rows wide enough for the
    # deepest neg_ranks variant
    rng = np.random.default_rng(1)
    sub = rng.choice(n, size=min(262_144, n), replace=False)
    base_sub = base[sub]
    k_sup = max([10] + [v.get("neg_ranks", (0, 0))[1]
                        for v in variants_all.values()])
    nbr_cache = res_dir / f"ab_nbrs_{args.corpus}_n{n}_k{k_sup}.npz"
    if nbr_cache.exists():
        train_nbrs = np.load(nbr_cache)["nbrs"]
        log(f"nbr cache hit: {nbr_cache.name}")
    else:
        t0 = time.perf_counter()
        train_nbrs = exact_ground_truth(base_sub, base_sub, k=k_sup + 1,
                                        q_chunk=16384, metric=metric)[:, 1:]
        log(f"supervision GT k={k_sup}: {time.perf_counter() - t0:.1f}s")
        np.savez_compressed(nbr_cache, nbrs=train_nbrs)

    gt10 = gt[:, :10]

    def cand_recall(idx, qlo, c):
        """R@10 after exact re-rank == |cand_c ∩ gt10| / 10 (candidates
        are duplicate-free; exact re-rank orders the pool perfectly)."""
        cand = np.asarray(idx.candidates(qlo, c=c))
        hits = (cand[:, None, :] == gt10[:, :, None]).any(-1).sum(-1)
        return float(hits.mean()) / 10.0

    def _norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                              1e-12)

    def ctrl_cache_path():
        if args.corpus == "sift":
            return res_dir / f"bench_proj_n{n}_d{d}x{d_lo}_s600_seed1.npz"
        return res_dir / f"ab_proj_glove_linear{d_lo}_n{n}_s3000.npz"

    rows = {}
    for name in names:
        ov = dict(variants_all[name])
        steps = ov.pop("steps")
        t0 = time.perf_counter()
        extra = {}
        if steps == 0:
            log(f"{name}: pca_fit...")
            pca = pca_fit(base_sub, d_lo)
            log(f"{name}: projecting corpus (host)...")
            base_lo = (base @ pca.components).astype(np.float32)
            qlo = np.asarray((query @ pca.components), np.float32)
            if metric == "angular":
                base_lo, qlo = _norm(base_lo), _norm(qlo)
        else:
            cfg_kw = dict(batch_size=1024, k_pos=10, lr=base_lr,
                          metric=metric)
            cfg_kw.update(ov)
            cfg = TrainConfig(d_out=d_lo, steps=steps, **cfg_kw)
            cache = (ctrl_cache_path() if name == ctrl_name
                     else res_dir / f"ab_recipe_{args.corpus}_{name}.npz"
                     if args.corpus == "glove"
                     else res_dir / f"ab_recipe_{name}_n{n}.npz")
            trained = None
            if cache.exists():
                try:
                    trained = load_projection(str(cache))
                    log(f"{name}: projection cache hit ({cache.name})")
                except Exception as e:
                    log(f"{name}: cache unreadable ({e}); retraining")
            if trained is None:
                trained = train_projection(base_sub, train_nbrs, cfg)
                save_projection(str(cache), trained)
                if trained.get("best_step") is not None:
                    extra = dict(best_step=int(trained["best_step"]),
                                 best_val=round(float(trained["best_val"]),
                                                4))
            base_lo = np.asarray(project(trained, base))
            qlo = np.asarray(project(trained, query))
        train_s = time.perf_counter() - t0
        # scan-only index: base_full is never re-ranked here, so pass the
        # projected corpus for it (keeps the per-variant upload small)
        log(f"{name}: building scan index...")
        idx = FusedScanIndex(base_lo, base_lo, metric=metric)
        qlo_j = jnp.asarray(qlo)
        rec = {}
        for c in cs:
            rec[str(c)] = round(cand_recall(idx, qlo_j, c), 4)
            log(f"{name}: c={c} -> {rec[str(c)]}")
        rows[name] = dict(variant=name, steps=steps, overrides=repr(ov),
                          train_s=round(train_s, 1), recall_at_c=rec,
                          **extra)
        log(f"{name}: train {train_s:.1f}s recall@c {rec} {extra or ''}")
        del idx, qlo_j

    # QPS per c: projection-independent (identical shapes/dtypes); one
    # full index with the real corpus + exact re-rank, pipelined timing
    cache = ctrl_cache_path()
    if cache.exists():
        trained = load_projection(str(cache))
        base_lo = np.asarray(project(trained, base))
        qlo = np.asarray(project(trained, query))
    full_idx = FusedScanIndex(base, base_lo, metric=metric)
    q_j, qlo_j = jnp.asarray(query), jnp.asarray(qlo)
    qps_at_c = {}
    for c in cs:
        run = lambda c=c: full_idx.search(q_j, qlo_j, k=10, c=c, merge=None)
        ids = jax.block_until_ready(run())[0]
        r10 = recall_at_k(np.asarray(ids), gt, 10)
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(out)
        qps = nq / ((time.perf_counter() - t0) / args.iters)
        qps_at_c[str(c)] = dict(qps=round(qps, 1),
                                ctrl_r10_reranked=round(float(r10), 4))
        log(f"  qps c={c:3d}: {qps:,.0f} (ctrl reranked R@10={r10:.4f})")

    # matched-recall QPS per variant: best swept-c QPS meeting each gate
    gates = (0.95, 0.97, 0.99)
    matched = {str(g): {name: max(
        (qps_at_c[str(c)]["qps"] for c in cs
         if rows[name]["recall_at_c"][str(c)] >= g), default=None)
        for name in names} for g in gates}

    out = dict(corpus=args.corpus, n=n, d=d, d_lo=d_lo, metric=metric,
               nq=nq, cs=list(cs), variants=list(rows.values()),
               qps_at_c=qps_at_c, qps_at_matched_r10=matched,
               note="recall@c computed from candidates+GT overlap (equals "
                    "post-exact-re-rank R@10; ctrl_r10_reranked cross-checks "
                    "it through the full search path). QPS per c is "
                    "projection-independent; matched table combines the two.")
    if args.corpus == "sift":
        path = res_dir / ("train_recipe_ab_1m.json" if n == 1_000_000
                          else f"train_recipe_ab_n{n}.json")
    else:
        path = res_dir / "train_recipe_ab_glove.json"
    path.write_text(json.dumps(out, indent=2, allow_nan=False))
    print(json.dumps(dict(out=str(path.relative_to(_root)), matched=matched)))


if __name__ == "__main__":
    main()
