"""End-to-end experiment pipeline: dataset → GT → projection → graph →
search sweep → results.

Capability parity: the reference's per-dataset driver scripts (SURVEY.md
§4.4) — with the same staged-artifact semantics (each stage's output is
written to ``cfg.out_dir``; reruns reuse nothing implicitly, stages are
explicit functions a caller can mix).

Design note (graph space): the kNN graph is built on the **full-dimension**
vectors — the graph encodes true neighborhood structure — while the walk
evaluates distances in the **reduced** space and the final pool is re-ranked
at full dimension (BASELINE.json:5). This matches the reference's split of
index-construction vs. query-time cost: projection changes per-hop cost, not
graph topology.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np

from gbnns_tpu.config import ExperimentConfig


def prepare_data(cfg: ExperimentConfig):
    from gbnns_tpu.io.datasets import load_dataset

    ds = load_dataset(cfg.dataset, scale=cfg.scale, max_base=cfg.max_base,
                      seed=cfg.seed)
    return ds


def compute_gt(cfg: ExperimentConfig, base, query, k: int = 100):
    from gbnns_tpu.eval.recall import exact_ground_truth

    return exact_ground_truth(query, base, k=min(k, base.shape[0]),
                              metric=cfg.metric)


def fit_projection(cfg: ExperimentConfig, base, query, gt):
    """Returns (base_lo, query_lo, artifact_dict)."""
    m = cfg.dimred.method
    if m == "none":
        return base, query, {}
    if m == "pca":
        from gbnns_tpu.dimred.pca import pca_fit, pca_transform

        model = pca_fit(base, cfg.dimred.d_out)
        normalize = cfg.metric == "angular"
        return (pca_transform(model, base, normalize=normalize),
                pca_transform(model, query, normalize=normalize),
                {"pca_mean": model.mean, "pca_components": model.components})
    from gbnns_tpu.dimred.train import (TrainConfig, load_projection,
                                        project, save_projection,
                                        train_projection)

    tc = TrainConfig(d_out=cfg.dimred.d_out, model=m, hidden=cfg.dimred.hidden,
                     metric=cfg.metric, margin=cfg.dimred.margin,
                     lr=cfg.dimred.lr, batch_size=cfg.dimred.batch_size,
                     steps=cfg.dimred.steps, k_pos=cfg.dimred.k_pos,
                     hard_negatives=cfg.dimred.hard_negatives,
                     neg_ranks=cfg.dimred.neg_ranks,
                     eval_every=cfg.dimred.eval_every,
                     seed=cfg.dimred.seed)
    # staged projection: keyed on everything that shapes training (the
    # dataset identity + the full TrainConfig + the supervision sampling);
    # a pipeline rerun with unchanged config loads instead of retraining
    # (same fix as bench.py's projection cache — training dominated rerun
    # wall time). Delete the npz (or change any knob) to retrain.
    import hashlib

    key_src = repr((cfg.dataset, cfg.scale, cfg.max_base, cfg.metric,
                    cfg.seed, cfg.dimred.train_sample, dataclasses_repr(tc),
                    int(base.shape[0]), int(base.shape[1])))
    key = hashlib.sha256(key_src.encode()).hexdigest()[:16]
    os.makedirs(cfg.out_dir, exist_ok=True)
    cache = os.path.join(cfg.out_dir, f"proj_{cfg.name}_{key}.npz")
    trained = None
    if os.path.exists(cache):
        try:
            trained = load_projection(cache)
            print(f"  projection cache hit: {os.path.basename(cache)}",
                  flush=True)
        except Exception as e:
            print(f"  projection cache unreadable ({e}); retraining",
                  flush=True)
    if trained is None:
        base_train, nbrs = gt_for_training(cfg, base, gt)
        trained = train_projection(base_train, nbrs, tc)
        save_projection(cache, trained)
    return project(trained, base), project(trained, query), {"trained": trained}


def dataclasses_repr(tc) -> str:
    import dataclasses as _dc

    return repr(_dc.asdict(tc))


def gt_for_training(cfg: ExperimentConfig, base, gt_query):
    """Training supervision: ``(base_train, nbrs)`` — each training node's
    true near neighbors, in-sample indices (the kNN graph rows double as
    supervision, SURVEY §4.2). Widened past k_pos when graph-mined
    negatives (dimred.neg_ranks) need deeper rank coverage.

    The exact base-vs-base GT is O(n²); at contract scale that is a second
    ~6-minute all-pairs sweep spent purely on training positives, so the
    supervision set is capped at ``dimred.train_sample`` rows (VERDICT r2
    item 6) — same fix bench.py:88-94 already carried."""
    from gbnns_tpu.eval.recall import exact_ground_truth

    need = cfg.dimred.k_pos
    if cfg.dimred.neg_ranks is not None:
        need = max(need, cfg.dimred.neg_ranks[1])
    n = base.shape[0]
    cap = cfg.dimred.train_sample
    base_train = base
    if cap and 0 < cap < n:
        rng = np.random.default_rng(cfg.dimred.seed)
        base_train = base[rng.choice(n, size=cap, replace=False)]
    nbrs = exact_ground_truth(base_train, base_train, k=need + 1,
                              metric=cfg.metric)
    return base_train, nbrs[:, 1:]


def build_graph(cfg: ExperimentConfig, base, base_lo=None):
    """Build the kNN graph over ``cfg.graph.space`` vectors: "full" encodes
    true neighborhoods (reference behavior); "reduced" builds in the walk's
    own projected geometry (see GraphConfig.space)."""
    from gbnns_tpu.build.knn_graph import build_knn_graph

    g = cfg.graph
    if g.space not in ("full", "reduced"):
        raise ValueError(f"unknown graph space {g.space!r}")
    vectors = base
    if g.space == "reduced":
        if base_lo is None:
            raise ValueError("graph.space='reduced' needs a projection "
                             "(dimred.method != 'none')")
        vectors = base_lo
    t0 = time.perf_counter()
    graph = build_knn_graph(vectors, g.k, metric=cfg.metric, chunk=g.chunk,
                            node_chunk=g.node_chunk, exact=g.exact,
                            recall_target=g.recall_target,
                            precision=g.precision, connect=g.connect,
                            backend=g.backend)
    return graph, time.perf_counter() - t0


def run_pipeline(cfg: ExperimentConfig) -> dict[str, Any]:
    from gbnns_tpu.cli import _run_search
    from gbnns_tpu.eval.bench import pareto, sweep

    os.makedirs(cfg.out_dir, exist_ok=True)
    ds = prepare_data(cfg)
    base, query = ds.base, ds.query
    gt = ds.gt if ds.gt is not None else compute_gt(cfg, base, query)

    base_lo, query_lo, artifacts = fit_projection(cfg, base, query, gt)
    # The sharded path builds its own per-shard subgraphs and the flat index
    # needs none, so the full-corpus graph is only built for the
    # single-chip graph engine.
    sharded = bool(cfg.n_devices and cfg.n_devices > 1)
    needs_graph = cfg.search.index == "graph" and not sharded
    graph, build_time = (build_graph(cfg, base, base_lo) if needs_graph
                         else (None, 0.0))

    if cfg.search.index in ("ivf", "gated"):
        efs = list(cfg.search.efs)  # probes need not cover k (rerank_c does)
    else:
        efs = [e for e in cfg.search.efs if e >= cfg.search.k]
        skipped = [e for e in cfg.search.efs if e < cfg.search.k]
        if skipped:
            print(f"  skipping ef<{cfg.search.k} (pool must cover top-k): "
                  f"{skipped}", flush=True)
    cfg.search.efs = tuple(efs)
    if cfg.n_devices and cfg.n_devices > 1:
        results = _sharded_sweep(cfg, base, base_lo, query, query_lo, gt)
    elif cfg.search.index in ("flat", "fused", "ivf", "gated"):
        results = _flat_sweep(cfg, base, base_lo, query, query_lo, gt)
    else:
        def run_one(ef):
            r, _ = _run_search(base, base_lo, query, query_lo, graph, gt, ef,
                               cfg.search.k, cfg.metric,
                               cfg.search.num_entries, cfg.search.max_hops,
                               cfg.search.visited_mode,
                               expand=cfg.search.expand,
                               dtype=cfg.search.dtype,
                               batch_size=cfg.search.batch_size,
                               packed=cfg.search.packed,
                               walker=cfg.search.walker,
                               centroid_entries=cfg.search.centroid_entries)
            return r
        results = sweep(run_one, list(cfg.search.efs))

    front = pareto(results)
    summary = {
        "name": cfg.name,
        "dataset": cfg.dataset,
        "n_base": int(base.shape[0]),
        "dim": int(base.shape[1]),
        "d_out": (None if cfg.dimred.method == "none" else cfg.dimred.d_out),
        "method": cfg.dimred.method,
        "graph_k": cfg.graph.k,
        "build_time_s": build_time,
        "results": [r.to_json() for r in results],
        "pareto": [r.to_json() for r in front],
    }
    out_path = os.path.join(cfg.out_dir, f"{cfg.name}.json")
    with open(out_path, "w") as f:
        # allow_nan=False is the strict-JSON regression gate: BenchResult
        # .to_json() nulls non-finite floats; anything that slips through
        # fails the write instead of poisoning the artifact (VERDICT r3).
        json.dump(summary, f, indent=2, allow_nan=False)
    try:  # paper-style artifact; optional (matplotlib present in this env)
        from gbnns_tpu.eval.plot import plot_sweeps

        png = os.path.join(cfg.out_dir, f"{cfg.name}.png")
        plot_sweeps({cfg.name: summary["results"]}, png,
                    title=f"{cfg.dataset}: recall vs QPS")
        summary["plot"] = png
    except Exception:
        pass
    return {"summary": summary, "graph": graph, "artifacts": artifacts,
            "out_path": out_path}


def microbatch(fn, query_arrays, batch_size: int):
    """Run ``fn(*chunks)`` over query micro-batches and concatenate the
    (ids, dists) outputs — bounds device memory for 10M-scale walker/scan
    runs (SearchConfig.batch_size). The tail chunk is padded to ``batch_size``
    so every call hits one compiled shape; padding rows are dropped on the
    way out. ``batch_size<=0`` or >= nq runs the whole set in one batch."""
    nq = query_arrays[0].shape[0]
    if not batch_size or batch_size >= nq:
        return fn(*query_arrays)
    ids_out, dists_out = [], []
    for s in range(0, nq, batch_size):
        e = min(s + batch_size, nq)
        chunk = [a[s:e] for a in query_arrays]
        if e - s < batch_size:
            pad = batch_size - (e - s)
            chunk = [np.concatenate([np.asarray(c),
                                     np.repeat(np.asarray(c[-1:]), pad, 0)])
                     for c in chunk]
        ids, dists = fn(*chunk)
        ids_out.append(np.asarray(ids)[:e - s])
        dists_out.append(np.asarray(dists)[:e - s])
    return np.concatenate(ids_out), np.concatenate(dists_out)


def _flat_sweep(cfg: ExperimentConfig, base, base_lo, query, query_lo, gt):
    """Sweep a scan engine (flat / fused Pallas / ivf) over its recall knob
    (candidate pool c for the scans, probes for ivf)."""
    import jax

    from gbnns_tpu.eval.bench import TIMING_MODE, BenchResult, time_search
    from gbnns_tpu.eval.recall import recall_at_k

    kind = cfg.search.index
    if kind == "fused":
        import jax.numpy as jnp

        from gbnns_tpu.kernels.scan_topk_pallas import FusedScanIndex

        sdt = ("int8" if cfg.search.scan_dtype == "int8" else jnp.bfloat16)
        idx = FusedScanIndex(base, base_lo, metric=cfg.metric,
                             scan_dtype=sdt)
    elif kind == "gated":
        from gbnns_tpu.search.gated import GatedScanIndex

        idx = GatedScanIndex(base, base_lo, metric=cfg.metric,
                             ncent=cfg.search.ivf_ncent or None,
                             seed=cfg.seed)
    elif kind == "ivf":
        from gbnns_tpu.search.ivf import IVFIndex

        idx = IVFIndex.build(base, base_lo, metric=cfg.metric,
                             ncent=cfg.search.ivf_ncent or None,
                             seed=cfg.seed)
    else:
        from gbnns_tpu.search.flat import FlatIndex

        idx = FlatIndex(base, base_lo, metric=cfg.metric)
    recall_k = min(10, cfg.search.k)
    results = []
    for c in cfg.search.efs:
        # dist/q accounting (SURVEY §5.1 parity with the reference metric):
        # scans evaluate every (reduced-dim) corpus row plus the full-dim
        # re-rank pool; ivf/gated evaluate their kept subsets plus re-rank.
        if kind == "ivf":
            dist_comps = float(c * idx.stats["cap"] + idx.stats["spill"]
                               + cfg.search.rerank_c)
            kw = dict(probes=c, c=cfg.search.rerank_c)
        elif kind == "gated":
            # measured below from the kept-tile fraction of the first batch
            dist_comps = None
            kw = dict(probes=c, c=cfg.search.rerank_c)
        else:
            dist_comps = float(base.shape[0] + c)
            kw = dict(c=c)
        if kind == "gated":
            bs = min(cfg.search.batch_size, query.shape[0])
            _, _, kept = idx.search(
                query[:bs], (query_lo if query_lo is not None else query)[:bs],
                k=cfg.search.k, return_kept_frac=True, **kw)
            n_pad = idx.stats["n_chunks"] * idx.chunk
            dist_comps = float(kept * n_pad + cfg.search.rerank_c)

        def run(kw=kw):
            return microbatch(
                lambda q, ql: idx.search(q, ql, k=cfg.search.k, **kw),
                (query, query_lo if query_lo is not None else query),
                cfg.search.batch_size)
        qps, sec, (ids, dists) = time_search(run, query.shape[0],
                                             warmup=1, iters=3)
        ids = np.asarray(ids)
        r = BenchResult(
            label=f"{kind}-c{c}", ef=c, qps=qps, latency_ms=sec * 1e3,
            recall_at_1=recall_at_k(ids, gt, 1),
            recall_at_10=recall_at_k(ids, gt, recall_k),
            n_queries=query.shape[0],
            dist_comps_per_query=dist_comps,
            hops=0, extra={"index": kind, "recall_cutoff": recall_k,
                           "timing": TIMING_MODE})
        results.append(r)
        print(f"  c={c:4d}  R@1={r.recall_at_1:.4f}  R@10={r.recall_at_10:.4f}"
              f"  QPS={r.qps:,.0f}", flush=True)
    return results


def _sharded_sweep(cfg: ExperimentConfig, base, base_lo, query, query_lo, gt):
    import jax

    from gbnns_tpu.eval.bench import TIMING_MODE, BenchResult, time_search
    from gbnns_tpu.eval.recall import recall_at_k
    from gbnns_tpu.search.sharded import (build_sharded_index, make_mesh,
                                          sharded_search)

    mesh = make_mesh(cfg.n_devices)
    idx = build_sharded_index(
        base, cfg.graph.k, mesh, base_lo=base_lo, metric=cfg.metric,
        with_graph=cfg.search.index in ("graph", "graph_pallas"),
        with_payload=cfg.search.index == "graph_pallas",
        ncent=(cfg.search.centroid_entries or 64
               if cfg.search.index == "graph_pallas" else 0),
        build_kwargs=dict(chunk=cfg.graph.chunk,
                          node_chunk=cfg.graph.node_chunk,
                          exact=cfg.graph.exact, connect=cfg.graph.connect))
    results = []
    for ef in cfg.search.efs:
        def run():
            return sharded_search(idx, query_lo, cfg.search.k, ef=ef,
                                  num_entries=cfg.search.num_entries,
                                  max_hops=cfg.search.max_hops,
                                  metric=cfg.metric,
                                  engine=cfg.search.index,
                                  queries_full=query)
        qps, sec, (ids, dists) = time_search(run, query_lo.shape[0],
                                             warmup=1, iters=3)
        ids = np.asarray(ids)
        recall_k = min(10, cfg.search.k)
        r = BenchResult(
            label=f"sharded-ef{ef}", ef=ef, qps=qps, latency_ms=sec * 1e3,
            recall_at_1=recall_at_k(ids, gt, 1),
            recall_at_10=recall_at_k(ids, gt, recall_k),
            n_queries=query_lo.shape[0],
            # scans: every reduced row once + per-shard full-dim re-rank of
            # ef candidates; graph walks: data-dependent (null, SURVEY §5.1)
            dist_comps_per_query=(
                float(base.shape[0] + cfg.n_devices * ef)
                if cfg.search.index in ("flat", "fused") else None),
            hops=-1, extra={"n_devices": cfg.n_devices,
                            "recall_cutoff": recall_k,
                            "timing": TIMING_MODE})
        results.append(r)
        print(f"  ef={ef:4d}  R@1={r.recall_at_1:.4f}  "
              f"R@10={r.recall_at_10:.4f}  QPS={r.qps:,.0f}", flush=True)
    return results
