"""GraphIndex — the TPU-native graph engine, assembled.

One object bundling everything the round-2 measurements showed the graph
path needs to be competitive on TPU (results/walker_ab_1m.json):

  * kNN graph built in the REDUCED space (the geometry the walk measures;
    also the GIST-config fix, GraphConfig.space),
  * the DMA-payload hop (walker_pallas: one 4 KB async copy per expanded
    node, 51 GB/s vs 4.2 GB/s for XLA's gather),
  * per-query centroid entry points (entries.CentroidEntries: coarse
    k-means seeds each walk in the right cluster, hops 30 → 21 measured
    at 1M, +24% QPS),
  * exact full-dim re-rank shared with every other engine.

Measured v5e, n=1M, PCA 128→32, K=32, B=8192:
  ef=32: 95.6k QPS @ R@10 0.941   ef=48: 83.4k QPS @ R@10 0.964
(vs 2.9–4.1k QPS for the round-1 walker — BASELINE.md 1M rows.)

The pure-JAX walker (walker_jax) remains the parity/oracle engine; this
class is the serving path. Reference capability: SURVEY §4.3 search main().
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gbnns_tpu.search.entries import CentroidEntries
from gbnns_tpu.search.rerank import rerank
from gbnns_tpu.search.walker_jax import default_entry_ids
from gbnns_tpu.search.walker_pallas import (HopPayload, beam_search_pallas,
                                            pack_hop_payload)


@dataclasses.dataclass
class GraphIndex:
    payload: HopPayload
    base_lo: jax.Array       # (n, d_lo) f32 — seeding + oracle use
    base_full: jax.Array     # (n, d) f32 — re-rank corpus
    base_sq: jax.Array       # (n,) f32
    graph: np.ndarray        # (n, K) int32 — kept for artifacts/oracles
    entries: CentroidEntries | None
    metric: str
    stats: dict

    @classmethod
    def build(cls, base_full, base_lo=None, *, K: int = 32,
              metric: str = "l2", vec_dtype: str = "bfloat16",
              ncent: int | None = 4096, seed: int = 0,
              graph: np.ndarray | None = None,
              rerank_dtype=jnp.float32,
              entries: "CentroidEntries | None" = None,
              hbm_budget: float | None = None,
              build_kwargs: dict[str, Any] | None = None) -> "GraphIndex":
        """Build graph (reduced space) + payload + centroid entries.
        ``ncent=None`` disables centroid entries (strided fallback);
        ``graph`` reuses a prebuilt adjacency instead of building.
        ``rerank_dtype=bf16`` halves the re-rank corpus HBM footprint
        (norms stay f32 — only the -2q·x dot term sees the rounding).

        ``hbm_budget`` (bytes): fail fast with a sizing breakdown when the
        estimated resident HBM (payload + re-rank corpus + reduced corpus)
        exceeds it, BEFORE the expensive graph build. The payload is the
        K-fold neighbor-inlining trade: n rows of ceil((K*d'/2+K)/1024)*4096
        bytes (bf16) — pack_hop_payload pads every row to whole 4 KB DMA
        tiles (walker_pallas._ROW_WORDS), so at GIST-like 1M x d'=128/K=32
        the payload is 12.3 GB, which plus an f32 960-d re-rank corpus
        exceeds a single v5e's 16 GB (measured RESOURCE_EXHAUSTED); corpora
        that big belong to the sharded engine (search/sharded.py)."""
        from gbnns_tpu.build.knn_graph import build_knn_graph
        from gbnns_tpu.search.sizing import graph_index_hbm

        base_full = np.asarray(base_full, np.float32)
        lo = base_full if base_lo is None else np.asarray(base_lo, np.float32)
        n, d_lo = lo.shape
        # graph_index_hbm raises on bf16 K*d_lo parity BEFORE the build
        # (pack_hop_payload's constraint) and pads payload rows to whole
        # 4 KB DMA tiles exactly like the packer — the first guard rounded
        # to 128 words and under-admitted real OOMs (ADVICE r4 high).
        sz = graph_index_hbm(
            n, base_full.shape[1], d_lo, K, vec_dtype=vec_dtype,
            rerank_itemsize=jnp.dtype(rerank_dtype).itemsize)
        payload_bytes = sz.payload_bytes
        est_bytes = sz.total_bytes
        if hbm_budget is not None and est_bytes > hbm_budget:
            raise MemoryError(
                f"GraphIndex resident-HBM estimate {est_bytes / 1e9:.1f} GB "
                f"(payload {payload_bytes / 1e9:.1f} + rerank corpus "
                f"{sz.rerank_bytes / 1e9:.1f} + reduced "
                f"{sz.reduced_bytes / 1e9:.1f}) exceeds budget "
                f"{hbm_budget / 1e9:.1f} GB; use rerank_dtype=bf16, a "
                f"smaller K, or the sharded engine (search/sharded.py)")
        if graph is None:
            graph = build_knn_graph(lo, K, metric=metric,
                                    **(build_kwargs or {}))
        graph = np.asarray(graph, np.int32)
        payload = pack_hop_payload(graph, lo, vec_dtype=vec_dtype)
        if entries is None:
            entries = (CentroidEntries.build(lo, ncent=ncent, metric=metric,
                                             seed=seed)
                       if ncent else None)
        base_sq = jnp.sum(jnp.asarray(base_full) ** 2, axis=-1)
        bf = jnp.asarray(base_full, dtype=rerank_dtype)
        return cls(payload=payload, base_lo=jnp.asarray(lo), base_full=bf,
                   base_sq=base_sq, graph=graph,
                   entries=entries, metric=metric,
                   stats=dict(n=int(lo.shape[0]), K=int(K),
                              vec_dtype=vec_dtype,
                              ncent=int(ncent or 0),
                              payload_bytes=int(payload_bytes),
                              est_hbm_bytes=int(est_bytes)))

    def search(self, queries_full, queries_lo=None, *, k: int = 10,
               ef: int = 48, num_entries: int = 16, max_hops: int = 64,
               expand: int = 4):
        """Walk + exact re-rank: (ids (B,k) int32, dists (B,k) f32).
        ``ef`` is the recall knob (candidate pool), exactly the
        reference's semantics."""
        qf = jnp.asarray(queries_full, dtype=jnp.float32)
        ql = qf if queries_lo is None else jnp.asarray(queries_lo,
                                                       dtype=jnp.float32)
        E = min(num_entries, ef)
        if self.entries is not None:
            ent = self.entries.query_entries(ql, E)
        else:
            ent = default_entry_ids(self.stats["n"], E)
        res = beam_search_pallas(ql, self.payload, self.base_lo, ent, ef=ef,
                                 metric=self.metric, max_hops=max_hops,
                                 expand=expand)
        return rerank(qf, self.base_full, res.ids, k, metric=self.metric,
                      base_sqnorms=self.base_sq)
