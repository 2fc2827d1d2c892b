"""IVF cluster-pruned scan: the large-corpus (1M–10M+) TPU fast path.

Capability context: the reference serves large corpora with its graph
walker — per-hop pointer chasing that on TPU is bounded by gather element
throughput (SURVEY.md §8.1/§8.2.1). The rebuild's flat MXU scan
(search/flat.py) wins up to ~1M rows but is HBM-bound on the score matrix
(every query scores every row). This module prunes that scan with the
classical IVF structure, re-architected so every stage is an MXU matmul,
a device sort, or a gather — never a TPU scatter:

  * build: k-means coarse quantizer (build/kmeans.py) over the *reduced*
    space; base rows laid out contiguously per cluster in fixed-capacity
    blocks (ncent, cap, d_lo) with a small always-scanned spill block for
    overflow rows, so recall never depends on cluster balance;
  * search is cluster-major ("pair bucketing", the shape GPU IVF engines
    use, re-expressed scatter-free): each query picks its top-``probes``
    clusters from one thin centroid matmul; the (query, cluster) pairs are
    bucketed by cluster with a device sort; each cluster then scores its
    assigned queries against its block in one batched MXU contraction.
    Per-query probe semantics are exact — no tile-union coverage
    heuristics — while each cluster block is read once per batch;
  * per-cluster survivors flow back to their queries by inverting the same
    sort (gathers only), are merged with the spill scan, and the final
    pool is re-ranked at full dimension exactly like every other engine
    (BASELINE.json:5).

Per-query scanned rows = probes * cap + spill — typically 0.5–5 % of the
corpus — turning the flat engine's O(nq * n) score traffic into
O(nq * probes * cap). Recall is governed by (probes, c) the same way the
walker's is by ef. Bucket capacity is ``slack``x the mean load; overflow
drops the *highest-rank* (least important) probes first, so pathological
query skew degrades gracefully.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gbnns_tpu.kernels.distance import METRICS, pairwise_dists, squared_norms
from gbnns_tpu.search.rerank import rerank

_INF = float("inf")  # python float: device constants in jit are pathological on axon


def _round_up(a: int, m: int) -> int:
    return -(-a // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("k", "c", "probes", "cprobe", "qslots", "metric"),
)
def ivf_search(q_lo, q_full, centroids, cent_sq, block_ids, blocks_lo,
               block_sq, spill_ids, spill_lo, spill_sq, base_full, base_sq,
               *, k: int, c: int, probes: int, cprobe: int, qslots: int,
               metric: str):
    """Cluster-major pruned scan. Returns (ids (B,k) int32, dists (B,k) f32).

    ``probes``: clusters scanned per query; ``cprobe``: candidates kept per
    (query, cluster) pair; ``c``: merged re-rank pool; ``qslots``: query
    slots per cluster (bucket capacity — static for one compiled shape).
    Scan-space distances drop the ||q||^2 term (constant per query, so
    per-query ranking is unchanged); the re-rank recomputes exact
    full-dimension distances.
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    B, d_lo = q_lo.shape
    ncent, cap = block_ids.shape
    S = spill_ids.shape[0]
    p = min(probes, ncent)
    cp = min(cprobe, cap)
    Qc = qslots
    scan_dtype = blocks_lo.dtype
    qf32 = q_lo.astype(jnp.float32)

    # ---- stage A: choose each query's probe clusters ---------------------
    # approx_max_k, not top_k: exact cluster ranking buys nothing (probing
    # is a coverage heuristic) and lax.top_k over thousands of centroids is
    # a full per-row sort — measured 37 ms vs ~5 ms at B=16k/ncent=4k.
    cd = pairwise_dists(qf32, centroids, metric=metric, x_sqnorms=cent_sq,
                        precision="default")                   # (B, ncent)
    _, probe_cl = jax.lax.approx_max_k(-cd, p, recall_target=0.95)
    cl = probe_cl.reshape(B * p).astype(jnp.int32)
    qi = jnp.repeat(jnp.arange(B, dtype=jnp.int32), p)
    rank = jnp.tile(jnp.arange(p, dtype=jnp.int32), B)

    # ---- bucket pairs by cluster (sort, never scatter) -------------------
    # key orders by (cluster, rank): under bucket overflow the highest-rank
    # (least important) probes are dropped first.
    key = cl * p + rank
    perm = jnp.argsort(key)
    cl_s = cl[perm]
    qi_s = qi[perm]
    # slot within the cluster's run = position - run start
    start = jnp.searchsorted(cl_s, jnp.arange(ncent, dtype=jnp.int32))
    slot = jnp.arange(B * p, dtype=jnp.int32) - start[cl_s]
    keep = slot < Qc
    grid = ncent * Qc
    g = jnp.where(keep, cl_s * Qc + slot, grid)                # sentinel=grid

    # occupancy table (ncent, Qc) via sorted-membership, not scatter — and
    # WITHOUT a second argsort (measured 188 ms for the two-sort bucketing
    # at B=16k): clamping overflow slots to their cluster's last kept slot
    # id keeps the sequence sorted (kept g ascends within a run, runs
    # ascend, and equal keys keep kept-before-dropped order), so stable
    # searchsorted's first hit per slot id is the true occupant.
    g_occ = jnp.where(keep, g, cl_s * Qc + (Qc - 1))
    o = jnp.arange(grid, dtype=jnp.int32)
    j = jnp.minimum(jnp.searchsorted(g_occ, o), B * p - 1)
    hit = g_occ[j] == o
    q_of_slot = jnp.where(hit, qi_s[j], 0).reshape(ncent, Qc)  # garbage rows
    # for unfilled slots are never read back (no pair points at them)

    # ---- stage B: per-cluster batched scan -------------------------------
    qvecs = jnp.take(qf32, q_of_slot.reshape(-1), axis=0)
    qvecs = qvecs.reshape(ncent, Qc, d_lo).astype(scan_dtype)
    dots = jax.lax.dot_general(
        qvecs, blocks_lo,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # (ncent,Qc,cap)
    if metric == "l2":
        dist = block_sq[:, None, :] - 2.0 * dots
    else:
        dist = -dots
    dist = jnp.where(block_ids[:, None, :] < 0, _INF, dist)
    nd, pos = jax.lax.approx_max_k(-dist, cp, recall_target=0.95)
    # per-cluster id lookup batched over the cluster axis — a vmap'd gather
    # instead of broadcasting block_ids to (ncent, Qc, cap), a 2 GB HBM
    # materialization at 1M/16k that dominated the route stage (SURVEY §9)
    slot_ids = jax.vmap(lambda bi, po: bi[po])(
        block_ids, pos.reshape(ncent, Qc * cp)).reshape(ncent, Qc, cp)
    # flatten + one padding row for dropped pairs (g == grid)
    flat_d = jnp.concatenate(
        [(-nd).reshape(grid, cp), jnp.full((1, cp), _INF)], axis=0)
    flat_i = jnp.concatenate(
        [slot_ids.reshape(grid, cp), jnp.full((1, cp), -1, jnp.int32)], axis=0)

    # ---- route candidates back to their queries --------------------------
    # one composed gather per array: flat[g][inv] == flat[g[inv]]; g[inv]
    # is a cheap int gather, then each pair row is fetched once (the
    # two-chained-row-gather form measured 685 ms at B=16k)
    inv = jnp.argsort(perm)
    g_r = jnp.take(g, inv, axis=0)
    pair_d = jnp.take(flat_d, g_r, axis=0).reshape(B, p * cp)
    pair_i = jnp.take(flat_i, g_r, axis=0).reshape(B, p * cp)

    # ---- spill rows: overflow beyond cluster capacity, always scanned ----
    sdots = jax.lax.dot_general(
        qf32.astype(scan_dtype), spill_lo,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (B, S)
    sdist = (spill_sq[None, :] - 2.0 * sdots) if metric == "l2" else -sdots
    sdist = jnp.where(spill_ids[None, :] < 0, _INF, sdist)

    all_d = jnp.concatenate([pair_d, sdist], axis=1)
    all_i = jnp.concatenate(
        [pair_i, jnp.broadcast_to(spill_ids[None, :], (B, S))], axis=1)
    cc = min(c, all_d.shape[1])
    _, sel = jax.lax.top_k(-all_d, cc)
    cand = jnp.take_along_axis(all_i, sel, axis=1)             # (B, cc)

    # ---- exact full-dim re-rank (shared with every engine) ---------------
    return rerank(q_full, base_full, cand, k, metric=metric,
                  base_sqnorms=base_sq)


@dataclasses.dataclass
class IVFIndex:
    """Device-resident cluster-blocked index over a (reduced) search space."""

    centroids: jax.Array      # (ncent, d_lo) f32
    cent_sq: jax.Array        # (ncent,) f32
    block_ids: jax.Array      # (ncent, cap) int32, -1 padding
    blocks_lo: jax.Array      # (ncent, cap, d_lo) scan dtype
    block_sq: jax.Array       # (ncent, cap) f32
    spill_ids: jax.Array      # (S,) int32, -1 padding
    spill_lo: jax.Array       # (S, d_lo)
    spill_sq: jax.Array       # (S,) f32
    base_full: jax.Array      # (n, d) f32 (re-rank corpus)
    base_sq: jax.Array        # (n,) f32
    metric: str
    stats: dict

    @classmethod
    def build(cls, base_full, base_lo=None, *, ncent: int | None = None,
              cap: int | None = None, metric: str = "l2", iters: int = 10,
              seed: int = 0, sample: int | None = 262_144,
              scan_dtype=jnp.bfloat16, assignments: np.ndarray | None = None,
              centroids: np.ndarray | None = None) -> "IVFIndex":
        """Fit the quantizer and lay the corpus out in cluster blocks.

        ``ncent`` defaults to ~4*sqrt(n) rounded to a power of two — mean
        cluster size ~sqrt(n)/4, so a query probing ``probes`` clusters
        scans probes*cap ≈ probes*sqrt(n)/2 rows. ``cap`` defaults to 2x
        the mean cluster size (rounded up to 8); rows past ``cap`` in an
        oversized cluster go to the always-scanned spill block, so skewed
        clusterings degrade throughput, never recall.
        """
        from gbnns_tpu.build.kmeans import kmeans_assign, kmeans_fit

        base_full = np.asarray(base_full, np.float32)
        lo = base_full if base_lo is None else np.asarray(base_lo, np.float32)
        n, d_lo = lo.shape
        if ncent is None:
            ncent = int(2 ** round(np.log2(max(8.0, 4.0 * np.sqrt(n)))))
            ncent = max(8, min(ncent, n // 4))
        if centroids is None:
            centroids = kmeans_fit(lo, ncent, iters=iters, seed=seed,
                                   sample=sample)
        else:
            centroids = np.asarray(centroids, np.float32)
            ncent = centroids.shape[0]
        assign = (kmeans_assign(lo, centroids) if assignments is None
                  else np.asarray(assignments))

        counts = np.bincount(assign, minlength=ncent)
        if cap is None:
            cap = _round_up(max(8, int(2.0 * max(1.0, counts.mean()))), 8)

        # stable sort rows by cluster; rank-within-cluster via offsets
        idx = np.argsort(assign, kind="stable").astype(np.int64)
        a_sorted = assign[idx]
        starts = np.zeros(ncent, np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        pos = np.arange(n, dtype=np.int64) - starts[a_sorted]
        in_block = pos < cap

        block_ids = np.full((ncent, cap), -1, np.int32)
        blocks_lo = np.zeros((ncent, cap, d_lo), np.float32)
        rows = idx[in_block]
        block_ids[a_sorted[in_block], pos[in_block]] = rows.astype(np.int32)
        blocks_lo[a_sorted[in_block], pos[in_block]] = lo[rows]
        block_sq = (blocks_lo.astype(np.float32) ** 2).sum(-1)

        spill_rows = idx[~in_block]
        S = max(128, _round_up(len(spill_rows), 128))
        spill_ids = np.full(S, -1, np.int32)
        spill_lo = np.zeros((S, d_lo), np.float32)
        spill_ids[:len(spill_rows)] = spill_rows.astype(np.int32)
        spill_lo[:len(spill_rows)] = lo[spill_rows]
        spill_sq = (spill_lo ** 2).sum(-1)

        stats = dict(n=n, ncent=int(ncent), cap=int(cap),
                     spill=int(len(spill_rows)),
                     spill_frac=float(len(spill_rows)) / n,
                     mean_cluster=float(counts.mean()),
                     max_cluster=int(counts.max()))
        bf = jnp.asarray(base_full)
        return cls(
            centroids=jnp.asarray(centroids),
            cent_sq=jnp.asarray((centroids.astype(np.float32) ** 2).sum(-1)),
            block_ids=jnp.asarray(block_ids),
            blocks_lo=jnp.asarray(blocks_lo, dtype=scan_dtype),
            block_sq=jnp.asarray(block_sq),
            spill_ids=jnp.asarray(spill_ids),
            spill_lo=jnp.asarray(spill_lo, dtype=scan_dtype),
            spill_sq=jnp.asarray(spill_sq),
            base_full=bf,
            base_sq=jnp.sum(bf * bf, axis=-1),
            metric=metric, stats=stats)

    def qslots_for(self, n_queries: int, probes: int, slack: float = 2.0) -> int:
        """Bucket capacity: ``slack``x the mean per-cluster pair load."""
        ncent = self.block_ids.shape[0]
        mean = max(1.0, n_queries * min(probes, ncent) / ncent)
        return _round_up(int(np.ceil(slack * mean)), 8)

    def search(self, queries_full, queries_lo=None, *, k: int = 10,
               c: int = 32, probes: int = 16, cprobe: int | None = None,
               slack: float = 2.0):
        """Pruned-scan search. ``probes`` is the recall knob (clusters
        scanned per query); ``c`` the re-rank pool; ``slack`` the bucket
        overflow headroom."""
        qf = jnp.asarray(queries_full, dtype=jnp.float32)
        ql = qf if queries_lo is None else jnp.asarray(queries_lo,
                                                       dtype=jnp.float32)
        if cprobe is None:
            cprobe = max(k, min(32, c))
        return ivf_search(ql, qf, self.centroids, self.cent_sq,
                          self.block_ids, self.blocks_lo, self.block_sq,
                          self.spill_ids, self.spill_lo, self.spill_sq,
                          self.base_full, self.base_sq,
                          k=k, c=c, probes=probes, cprobe=cprobe,
                          qslots=self.qslots_for(ql.shape[0], probes, slack),
                          metric=self.metric)
