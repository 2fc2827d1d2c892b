"""Per-query entry-point selection for the graph walkers.

The reference starts every walk from a fixed entry point and spends the
first O(log n) hops descending from it (SURVEY §4.3); the rebuild's
round-1 walker used 32 strided shared entries (walker_jax.default_entry_ids)
for reachability. This module replaces both with the IVF-graph hybrid
shape: a coarse k-means quantizer (build/kmeans.py, MXU-fit) picks each
query's E nearest centroids, and the walk starts AT those clusters'
representative nodes — skipping the descent phase entirely. One thin
(B, ncent) centroid matmul per batch buys a multi-hop reduction in the
sequential walk, which is the walker's scarcest resource on TPU (every
hop is a full lockstep round-trip).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gbnns_tpu.kernels.distance import pairwise_dists


@dataclasses.dataclass
class CentroidEntries:
    """Coarse quantizer + one representative (nearest real node) per
    centroid. ``query_entries`` maps a query batch to (B, E) start nodes."""

    centroids: jax.Array    # (ncent, d_lo) f32
    cent_sq: jax.Array      # (ncent,) f32
    node_ids: jax.Array     # (ncent,) int32 — nearest corpus row per centroid
    metric: str

    @classmethod
    def build(cls, base_lo, *, ncent: int = 1024, metric: str = "l2",
              iters: int = 8, seed: int = 0,
              sample: int | None = 262_144) -> "CentroidEntries":
        from gbnns_tpu.build.kmeans import kmeans_fit
        from gbnns_tpu.kernels.topk import knn_chunked

        lo = np.asarray(base_lo, np.float32)
        ncent = max(8, min(ncent, lo.shape[0]))
        cent = kmeans_fit(lo, ncent, iters=iters, seed=seed, sample=sample)
        # each centroid's representative = its nearest real corpus row
        _, ids = knn_chunked(jnp.asarray(cent), jnp.asarray(lo), 1,
                             metric=metric, chunk=65536, exact=False,
                             recall_target=0.95)
        cent_j = jnp.asarray(cent)
        return cls(centroids=cent_j,
                   cent_sq=jnp.sum(cent_j * cent_j, axis=-1),
                   node_ids=jnp.asarray(ids[:, 0], jnp.int32),
                   metric=metric)

    def save(self, path: str) -> None:
        """Stage the quantizer as a flat npz artifact (no pickling) —
        k-means is compile-bound on this relay (~100 s cold per process,
        SURVEY §9.6), so serving restarts should load, not refit."""
        np.savez(path, centroids=np.asarray(self.centroids),
                 cent_sq=np.asarray(self.cent_sq),
                 node_ids=np.asarray(self.node_ids),
                 metric=np.array(self.metric))

    @classmethod
    def load(cls, path: str) -> "CentroidEntries":
        z = np.load(path, allow_pickle=False)
        return cls(centroids=jnp.asarray(z["centroids"]),
                   cent_sq=jnp.asarray(z["cent_sq"]),
                   node_ids=jnp.asarray(z["node_ids"], jnp.int32),
                   metric=str(z["metric"]))

    def query_entries(self, queries_lo, E: int) -> jax.Array:
        """(B, E) int32 start nodes: representatives of the E nearest
        centroids (may contain per-row duplicates when two centroids share
        a representative — the walker's dedup absorbs them)."""
        q = jnp.asarray(queries_lo, jnp.float32)
        d = pairwise_dists(q, self.centroids, metric=self.metric,
                           x_sqnorms=self.cent_sq, precision="default")
        # approx_max_k: exact top-E of the centroid ranking buys nothing
        # (entries are a seeding heuristic) and lax.top_k over thousands of
        # centroids is a full per-row sort
        _, sel = jax.lax.approx_max_k(-d, min(E, self.centroids.shape[0]),
                                      recall_target=0.95)
        return self.node_ids[sel]
