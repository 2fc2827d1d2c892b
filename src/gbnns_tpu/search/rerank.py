"""Full-dimension re-rank of the search candidate pool.

Capability parity: the reference's final exact re-scoring of beam candidates
in the original dimension (SURVEY.md §4.3, BASELINE.json:5 "final candidates
re-ranked at full dimension"). TPU-first: one batched gather of candidate
rows plus one batched MXU contraction over the whole query batch — the exact
distances recover the recall lost to the d→d' projection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gbnns_tpu.kernels.distance import METRICS, squared_norms
from gbnns_tpu.search.walker_jax import _batched_dists


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def rerank(queries_full, base_full, candidate_ids, k: int, *,
           metric: str = "l2",
           base_sqnorms: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Re-score ``candidate_ids (B, C)`` with exact full-dim distances and
    return the top ``k``: ``(ids (B,k) int32, dists (B,k) float32)``.

    Slots with id < 0 (unfilled pool entries) or id >= n (padding-bin
    winners of the fused scan on corpora smaller than c bins — ``jnp.take``
    would clamp them onto row n-1 with a REAL distance otherwise) are
    excluded. Duplicate ids in a row (possible under the walker's "beam"
    visited mode after evictions) would inflate recall@k if both copies
    survived; they are masked so each id is counted once.
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    B, C = candidate_ids.shape
    if k > C:
        raise ValueError(f"k={k} > candidate pool {C}")
    qf = queries_full.astype(jnp.float32)
    q_sq = squared_norms(qf)
    x_sq = squared_norms(base_full) if base_sqnorms is None else base_sqnorms

    ids_safe = jnp.maximum(candidate_ids, 0)
    vecs = jnp.take(base_full, ids_safe, axis=0)              # (B,C,d)
    vsq = jnp.take(x_sq, ids_safe, axis=0)
    # Exact full-dim distances: full-f32 matmul precision on TPU.
    dists = _batched_dists(qf, vecs, vsq, q_sq, metric, precision="highest")

    first_occurrence = (
        jnp.sum((candidate_ids[:, :, None] == candidate_ids[:, None, :])
                & (jnp.arange(C)[None, None, :] < jnp.arange(C)[None, :, None]),
                axis=-1) == 0
    )
    valid = ((candidate_ids >= 0) & (candidate_ids < base_full.shape[0])
             & first_occurrence)
    dists = jnp.where(valid, dists, jnp.inf)
    neg_d, sel = jax.lax.top_k(-dists, k)
    top_ids = jnp.take_along_axis(candidate_ids, sel, axis=1)
    return top_ids, -neg_d
