"""Flat (brute-force) search over the reduced space + full-dim re-rank.

Capability: the reference's brute-force engine (SURVEY.md §3 "Ground-truth /
brute force") promoted to a first-class *query-time* index. On TPU this is
not a fallback — it is the fast path for corpora up to a few million
vectors: a d→d' learned projection turns per-query scoring into a thin
dense matmul that the MXU executes at hundreds of TFLOP/s, while the
random-access graph walk is bounded by the chip's element-rate gather
throughput (~3G elements/s measured). The reference uses the projection to
cheapen scalar distance evaluations inside a CPU graph walk; the TPU-native
reading of the same idea is to cheapen a *matmul scan*:

    score = Q_lo @ X_lo^T   (nq x n, bf16 MXU)  →  top-C per query
    →  exact full-dim re-rank of the C candidates (BASELINE.json:5)

Recall is governed by C (candidate pool) exactly like the walker's ef, so
the same recall-vs-QPS sweep applies. Crossover vs. the graph walker is at
the corpus size where n x d' matmul work exceeds the walker's
~dist_comps x d' gather work (~several million rows at d'=32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gbnns_tpu.kernels.topk import knn_chunked
from gbnns_tpu.search.rerank import rerank


@functools.partial(
    jax.jit,
    static_argnames=("k", "c", "metric", "chunk", "exact", "precision"),
)
def flat_search(queries_lo, base_lo, queries_full, base_full, k: int, *,
                c: int = 32, metric: str = "l2", chunk: int = 65536,
                exact: bool = False, precision: str | None = "default",
                base_full_sqnorms: jax.Array | None = None):
    """Scan the reduced space for top-``c`` candidates, re-rank at full
    dimension, return (ids (B,k) int32, dists (B,k) f32).

    ``exact=False`` uses the TPU-native bucketed ``approx_max_k`` for the
    candidate scan (the full-dim re-rank restores exact ordering of the
    survivors, so end recall is governed by candidate coverage, not by the
    scan's tie-handling). ``precision="default"`` lets the scan run bf16 on
    the MXU — candidate selection tolerates it; the re-rank is always
    full-f32 (rerank.py).
    """
    sd, si = knn_chunked(queries_lo, base_lo, c, metric=metric, chunk=chunk,
                         exact=exact, recall_target=0.95, precision=precision)
    return rerank(queries_full, base_full, si, k, metric=metric,
                  base_sqnorms=base_full_sqnorms)


class FlatIndex:
    """Convenience wrapper holding device-resident corpus + projection."""

    def __init__(self, base_full, base_lo=None, *, metric: str = "l2",
                 scan_dtype=jnp.bfloat16):
        self.metric = metric
        self.base_full = jnp.asarray(np.asarray(base_full, np.float32))
        lo = base_full if base_lo is None else base_lo
        self.base_lo = jnp.asarray(np.asarray(lo), dtype=scan_dtype)
        self.base_full_sqnorms = jnp.sum(self.base_full * self.base_full, -1)

    def search(self, queries_full, queries_lo=None, *, k: int = 10,
               c: int = 32, exact: bool = False):
        # jnp.asarray, NOT np.asarray: queries may already live on device,
        # and a numpy round-trip is a D2H+H2D pair through the relay.
        qf = jnp.asarray(queries_full, dtype=jnp.float32)
        ql = qf if queries_lo is None else jnp.asarray(queries_lo)
        ql = ql.astype(self.base_lo.dtype)
        return flat_search(ql, self.base_lo, qf, self.base_full, k, c=c,
                           metric=self.metric, exact=exact,
                           base_full_sqnorms=self.base_full_sqnorms)
