"""Typed experiment configuration with JSON overrides.

Capability parity: the reference drives experiments with argv positional
args and constants edited in shell scripts (SURVEY.md §5.6); the rebuild
uses dataclass configs — one checked-in JSON per BASELINE config
(BASELINE.json:7-11) lives in ``configs/``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass
class GraphConfig:
    k: int = 32                    # graph degree K
    chunk: int = 65536             # base-sweep tile (columns of the distance matmul)
    node_chunk: int = 8192         # node tile (rows)
    exact: bool = True
    recall_target: float = 0.99    # for exact=False (approx_max_k)
    connect: bool = True           # directed-reachability repair
    precision: str | None = None   # None => "highest" when exact
    # Distance-sweep backend: "xla" (exact/approx_max_k streaming scan),
    # "fused" (binned Pallas scan, ~8x faster approx build), "pallas"
    # (VMEM-resident exact distance+top-k kernel).
    backend: str = "xla"
    # Which vectors the graph is built over. "full" encodes true
    # neighborhoods (reference behavior); "reduced" builds in the walk's own
    # projected geometry so every edge is locally greedy *in the space the
    # walk actually measures* — the fix for high-d configs where the
    # projection distorts full-dim neighborhoods enough that the walker
    # stalls (GIST walker R@10 0.71 @ ef128 in round 1, VERDICT item 4).
    space: str = "full"            # "full" | "reduced"


@dataclasses.dataclass
class DimRedConfig:
    method: str = "none"           # "none" | "pca" | "linear" | "mlp"
    d_out: int = 32
    hidden: int = 512              # mlp only
    margin: float | None = None
    lr: float = 1e-3
    batch_size: int = 1024
    steps: int = 2000
    k_pos: int = 10
    hard_negatives: bool = True
    # Graph-mined negatives: (lo, hi) GT ranks to sample negatives from
    # (confusable near-misses), or null for uniform corpus negatives.
    neg_ranks: tuple[int, int] | None = None
    # Validation-gated checkpoint selection cadence (TrainConfig.eval_every):
    # score held-out NN-ordering preservation every N steps and keep the
    # best checkpoint INCLUDING the init (0 = off). Round-5 finding: the
    # hinge recipe can train below its own PCA init on Gaussian-like
    # corpora (results/train_recipe_ab_1m.json).
    eval_every: int = 0
    # Training-positive subsample: the triplet trainer's positives come from
    # an exact in-sample GT, which is O(n²) on the full corpus (~6 min of
    # pure supervision cost at 1M). Projection quality is corpus-statistics
    # bound, not n-bound (bench.py trains on 262k with unchanged downstream
    # recall), so cap the supervision set. 0 disables the cap.
    train_sample: int = 262_144
    seed: int = 0


@dataclasses.dataclass
class SearchConfig:
    # "graph" (beam walker) | "flat" (XLA MXU scan) | "fused" (Pallas
    # binned scan) | "ivf" (cluster-pruned scan) | "gated" (cluster-gated
    # Pallas scan, search/gated.py) | "graph_pallas" (sharded runs only:
    # per-shard DMA-payload walker)
    index: str = "graph"
    k: int = 10                    # final top-k
    efs: tuple[int, ...] = (16, 32, 64, 128, 256)  # recall knob sweep:
    # graph: pool size ef | flat/fused: re-rank pool c | ivf: probes
    rerank_c: int = 32             # ivf: re-rank pool (probes swept via efs)
    ivf_ncent: int = 0             # ivf: clusters (0 = auto ~4*sqrt(n))
    num_entries: int = 32
    max_hops: int = 256
    visited_mode: str = "beam"
    expand: int = 4                # frontier nodes expanded per lockstep hop
    dtype: str = "float32"         # search-space storage: float32 | bfloat16
    batch_size: int = 0            # 0 = whole query set in one device batch
    packed: bool = False           # walker: inline (K,d) neighbor rows (pack_neighbors)
    walker: str = "jax"            # graph hop backend: "jax" | "pallas" (DMA payload)
    centroid_entries: int = 0      # >0: per-query k-means entry points (ncent)
    scan_dtype: str = "bfloat16"   # fused scan corpus: bfloat16 | int8
    # (int8: 2x MXU rate on v5e; per-query dequant, re-rank absorbs rounding)


@dataclasses.dataclass
class ExperimentConfig:
    name: str = "experiment"
    dataset: str = "sift1m"
    scale: float = 1.0             # synthetic-fallback size multiplier
    max_base: int | None = None
    metric: str = "l2"
    seed: int = 0
    n_devices: int | None = None   # None = single chip; >1 = sharded mesh
    graph: GraphConfig = dataclasses.field(default_factory=GraphConfig)
    dimred: DimRedConfig = dataclasses.field(default_factory=DimRedConfig)
    search: SearchConfig = dataclasses.field(default_factory=SearchConfig)
    out_dir: str = "results"

    def to_json(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "ExperimentConfig":
        obj = dict(obj)
        graph = GraphConfig(**obj.pop("graph", {}))
        dimred_d = obj.pop("dimred", {})
        if dimred_d.get("neg_ranks") is not None:
            dimred_d["neg_ranks"] = tuple(dimred_d["neg_ranks"])
        dimred = DimRedConfig(**dimred_d)
        search_d = obj.pop("search", {})
        if "efs" in search_d:
            search_d["efs"] = tuple(search_d["efs"])
        search = SearchConfig(**search_d)
        return cls(graph=graph, dimred=dimred, search=search, **obj)

    @classmethod
    def load(cls, path: str, **overrides) -> "ExperimentConfig":
        with open(path) as f:
            obj = json.load(f)
        obj.update(overrides)
        return cls.from_json(obj)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_json(), f, indent=2)
