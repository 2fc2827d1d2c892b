"""gbnns_tpu — TPU-native graph-based nearest-neighbor search with learned
dimensionality reduction.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of the
reference repo ``Shekhale/gbnns_dim_red`` (an index-and-query engine: exact
kNN-graph construction, triplet-loss-trained linear/MLP dimensionality
reduction, greedy/beam graph search with full-dimension re-rank, and a
recall-vs-QPS evaluation harness).

NOTE on reference citations: the reference mount ``/root/reference`` was empty
in every session so far (see SURVEY.md §0), so docstrings cite the build
contract ``BASELINE.json`` and ``SURVEY.md`` sections instead of reference
file:line pairs.

Layout (SURVEY.md §7.1):
  io/        fvecs/ivecs codecs, dataset registry, synthetic data
  kernels/   Pallas/MXU distance + top-k kernels, fused walker kernel
  build/     exact kNN-graph construction
  dimred/    projection models, triplet trainer, PCA baseline
  search/    batched beam-search walker (pure JAX + Pallas), re-rank, sharded
  eval/      recall, QPS benchmarking, sweeps
"""

__version__ = "0.1.0"

# Lazy top-level API: the surface a reference user needs, importable as
# `from gbnns_tpu import FusedScanIndex, ...` without paying for modules
# they don't touch (jax imports are heavy on this relay).
_EXPORTS = {
    # engines
    "FusedScanIndex": "gbnns_tpu.kernels.scan_topk_pallas",
    "GraphIndex": "gbnns_tpu.search.graph_index",
    "FlatIndex": "gbnns_tpu.search.flat",
    "IVFIndex": "gbnns_tpu.search.ivf",
    "GatedScanIndex": "gbnns_tpu.search.gated",
    # build / train
    "build_knn_graph": "gbnns_tpu.build.knn_graph",
    "TrainConfig": "gbnns_tpu.dimred.train",
    "train_projection": "gbnns_tpu.dimred.train",
    "project": "gbnns_tpu.dimred.train",
    "pca_fit": "gbnns_tpu.dimred.pca",
    "pca_transform": "gbnns_tpu.dimred.pca",
    # data / eval
    "load_dataset": "gbnns_tpu.io.datasets",
    "exact_ground_truth": "gbnns_tpu.eval.recall",
    "recall_at_k": "gbnns_tpu.eval.recall",
    # multi-chip
    "make_mesh": "gbnns_tpu.search.sharded",
    "build_sharded_index": "gbnns_tpu.search.sharded",
    "sharded_search": "gbnns_tpu.search.sharded",
    # experiment driver
    "ExperimentConfig": "gbnns_tpu.config",
    "run_pipeline": "gbnns_tpu.pipeline",
}

__all__ = ["__version__", *_EXPORTS]


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'gbnns_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(__all__)
