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
