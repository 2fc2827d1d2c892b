"""Cluster-gated fused scan — the round-3 structural attack on the scan
engine's MXU-output-rate floor.

The round-3 epilogue study (results/epilogue_study_1m.jsonl) settled where
the fused binned scan's time goes at 1M x 16k: the matmul ALONE is 27.6 ms
of the 30.3 ms kernel — at d'=32 the MXU is output-rate-bound (~5.8e11
scores/s), so no epilogue tuning can buy more than ~10%. The only >1.5x
lever is computing FEWER scores. IVF does that by bucketing, and loses on
TPU (45k QPS vs 406k — gather/bucketing overhead, results/BENCH_r02); this
module does it with zero gathers and fully static shapes:

  offline   k-means the corpus into clusters of ~chunk/4 rows, PACK whole
            clusters into corpus chunks (first-fit decreasing; oversize
            clusters split at chunk boundaries) so every cluster maps to
            exactly one chunk, and interleave each chunk's rows across its
            fine bins; precompute each cluster's ranked neighbor-cluster
            list (the routing table);
  at query  (1) one thin (B, ncent) centroid matmul -> PRIMARY cluster
            per query; (2) the query inherits its primary's top-``probes``
            neighbor clusters — every same-primary query keeps an
            IDENTICAL chunk set, so sorting the batch by primary makes
            per-tile keep-mask unions tight (per-QUERY gating measured
            12.9% coverage but 97-100% tile union in v1, the round-3
            diagnostic results/gated_diag_1m.json); (3) run the binned
            Pallas scan with whole (chunk x query-tile) cells skipped via
            scalar-prefetched gating, each kept chunk emitting its TOP-M
            candidates in-kernel (kernels.scan_topk_pallas.
            gated_topm_scan); (4) merge chunk winners -> top-c in the
            sorted order, unsort the small (B, c) candidate matrix, and
            re-rank at full dimension in INPUT order (no full-dim query
            gathers).

Recall semantics: IVF with cluster-adjacency routing — the probed set is
the primary's ``probes`` nearest clusters rather than the query's own
(the difference is one cluster-quantization of the query; boundary
queries' primaries list the adjacent clusters first). Knobs: ``probes``
(clusters scanned) and ``c`` (re-rank pool).

Reference capability: the TPU-native answer to the reference's "make
per-distance cost cheap" goal (SURVEY §1 item 2) at corpus scale, beyond
the reference's own design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gbnns_tpu.kernels.scan_topk_pallas import _round_up, gated_topm_scan


def _chain_order(cent: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Greedy nearest-neighbor chain over centroids: a spatial traversal
    so that chain-adjacent clusters are geometric neighbors. Packing in
    this order puts a cluster's probe neighborhood into FEW, ADJACENT
    chunks — the lever that collapses per-tile keep-mask unions (v2's
    size-ordered first-fit scattered neighbor clusters across chunks:
    kept 0.85 at probes=8, results/gated_1m.json)."""
    ncent = cent.shape[0]
    d2 = ((cent[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    visited = np.zeros(ncent, bool)
    cur = int(np.argmax(sizes))          # start at the densest region
    chain = [cur]
    visited[cur] = True
    for _ in range(ncent - 1):
        row = np.where(visited, np.inf, d2[cur])
        cur = int(np.argmin(row))
        visited[cur] = True
        chain.append(cur)
    return np.asarray(chain, np.int64)


def _pack_clusters(assign: np.ndarray, ncent: int, chunk: int,
                   cent: np.ndarray, lookahead: int = 8):
    """Chain-ordered sequential packing of whole clusters into chunks.

    Clusters are visited along the nearest-neighbor chain; each goes into
    the current chunk if it fits, else into the best-fitting of the next
    ``lookahead`` chain clusters first (gap filling), else a new chunk.
    Oversize clusters split at chunk boundaries.

    Returns (slot_of_row (n,) int64 — final corpus position per original
    row, n_chunks, cluster_chunk_mask (ncent, n_chunks) bool,
    chain_rank (ncent,) int64). Positions not covered by a row are
    padding.
    """
    n = assign.shape[0]
    sizes = np.bincount(assign, minlength=ncent)
    chain = _chain_order(cent, sizes)
    chain_rank = np.empty(ncent, np.int64)
    chain_rank[chain] = np.arange(ncent)

    caps: list[int] = [chunk]                        # free slots per chunk
    placed: list[list[tuple[int, int, int]]] = [[]]  # (cluster, lo, count)

    def put(c, off, take, j):
        placed[j].append((c, off, take))
        caps[j] -= take

    pending = [int(c) for c in chain if sizes[c] > 0]
    while pending:
        c = pending.pop(0)
        size = int(sizes[c])
        if size > caps[-1]:
            # gap-fill: pull forward the first of the next few chain
            # clusters that fits the current chunk's remaining space
            for li in range(min(lookahead, len(pending))):
                if sizes[pending[li]] <= caps[-1]:
                    pending.insert(0, c)
                    c = pending.pop(li + 1)
                    size = int(sizes[c])
                    break
            else:
                caps.append(chunk)
                placed.append([])
        off = 0
        while size > 0:                  # oversize clusters split here
            take = min(size, caps[-1])
            if take == 0:
                caps.append(chunk)
                placed.append([])
                continue
            put(c, off, take, len(caps) - 1)
            off += take
            size -= take
    n_chunks = len(caps)
    # rows of each cluster in original-corpus order
    row_of = np.argsort(assign, kind="stable")
    starts = np.zeros(ncent + 1, np.int64)
    starts[1:] = np.cumsum(sizes)
    slot_of_row = np.full(n, -1, np.int64)
    mask = np.zeros((ncent, n_chunks), bool)
    for j, pieces in enumerate(placed):
        pos = j * chunk
        for c, off, take in pieces:
            rows = row_of[starts[c] + off:starts[c] + off + take]
            slot_of_row[rows] = np.arange(pos, pos + take)
            mask[c, j] = True
            pos += take
    return slot_of_row, n_chunks, mask, chain_rank


@functools.partial(jax.jit, static_argnames=("n_chunks", "tq", "probes"))
def _plan_queries(ql, cent, cent_sq, neighbors, chunk_mask, chain_rank, *,
                  n_chunks: int, tq: int, probes: int):
    """Sort order + per-tile chunk keep mask via cluster-level routing.

    Returns (order (Bp,) int32 — sorted position -> padded input row,
    tile_mask (n_chunks * Bp/tq,) int32). Padding rows (>= B) sort last
    and keep nothing. Queries sort by their primary's CHAIN RANK, so a
    tile's primaries are spatial neighbors and their probe sets (and
    therefore kept chunks) overlap heavily.
    """
    B = ql.shape[0]
    Bp = -(-B // tq) * tq
    ncent = cent.shape[0]
    # ||c||^2 - 2 q.c: the per-query ||q||^2 cannot change the argmin
    d = cent_sq[None, :] - 2.0 * (ql @ cent.T)
    primary = jnp.argmin(d, axis=1).astype(jnp.int32)        # (B,)
    key = chain_rank[primary]
    key_pad = jnp.full((Bp,), ncent, jnp.int32).at[:B].set(key)
    order = jnp.argsort(key_pad).astype(jnp.int32)

    P = min(probes, neighbors.shape[1])
    nb = neighbors[primary][:, :P]                           # (B, P)
    keep_q = chunk_mask[nb].any(axis=1)                      # (B, n_chunks)
    keep_pad = jnp.zeros((Bp, n_chunks), jnp.bool_).at[:B].set(keep_q)
    tile_keep = keep_pad[order].reshape(Bp // tq, tq, n_chunks).any(axis=1)
    return order, tile_keep.T.reshape(-1).astype(jnp.int32)


class GatedScanIndex:
    """Drop-in alternative to FusedScanIndex with cluster gating.

    Same (reduced-space scan -> exact full-dim re-rank) contract; two
    recall knobs: ``c`` (re-rank pool, as in FusedScanIndex) and
    ``probes`` (neighbor clusters scanned, IVF semantics).
    """

    def __init__(self, base_full, base_lo=None, *, metric: str = "l2",
                 ncent: int | None = None, scan_dtype=jnp.bfloat16,
                 fine: int = 32, m: int = 16, sub: int = 1024,
                 chunk: int = 16384, tq: int = 512, max_probes: int = 64,
                 seed: int = 0, kmeans_iters: int = 8,
                 kmeans_sample: int | None = 262_144):
        from gbnns_tpu.build.kmeans import kmeans_assign, kmeans_fit

        if metric not in ("l2", "ip", "angular"):
            raise ValueError(f"unknown metric {metric!r}")
        if metric == "ip":
            # _plan_queries routes by L2 centroid distance and the cluster
            # neighbor table is L2-based: under raw inner-product scoring
            # that biases probes toward low-norm clusters (silent recall
            # loss). angular (normalized) is equivalent to L2 routing;
            # proper ip routing needs max-q·c scoring end to end — reject
            # until it exists (ADVICE r3).
            raise ValueError("GatedScanIndex does not support metric='ip': "
                             "cluster routing is L2-based; use metric="
                             "'angular' (normalized) or FusedScanIndex")
        self.metric = metric
        self.fine = fine
        self.m = m
        self.sub = sub
        self.chunk = chunk
        self.tq = tq
        base_full = np.asarray(base_full, np.float32)
        lo = base_full if base_lo is None else np.asarray(base_lo,
                                                          np.float32)
        n, d_lo = lo.shape
        self.n = n
        if ncent is None:
            # clusters of ~chunk/4 rows: small enough that `probes`
            # clusters cover a few chunks, big enough that a chunk holds
            # whole clusters (packing keeps spans at exactly 1 chunk)
            ncent = -(-n // (chunk // 4))
        ncent = max(8, min(ncent, n))

        cent = kmeans_fit(lo, ncent, iters=kmeans_iters, seed=seed,
                          sample=kmeans_sample)
        assign = kmeans_assign(lo, cent)
        slot_of_row, self.n_chunks, cmask, chain_rank = _pack_clusters(
            assign, ncent, chunk, cent)
        self.chain_rank = jnp.asarray(chain_rank.astype(np.int32))
        n_pad = self.n_chunks * chunk

        # within-chunk fine-bin interleave (see gated_topm_scan): packed
        # cluster runs are contiguous, and a fine bin keeps one winner —
        # send consecutive rows to consecutive fine bins instead
        nbc = chunk // fine
        local = slot_of_row % chunk
        il_local = (local % nbc) * fine + local // nbc
        slot_il = (slot_of_row // chunk) * chunk + il_local

        final_order = np.full(n_pad, -1, np.int64)
        final_order[slot_il] = np.arange(n)
        real = final_order >= 0
        self.perm = jnp.asarray(np.where(real, final_order, -1)
                                .astype(np.int32))  # kernel pos -> orig id
        lo_pad = np.zeros((n_pad, d_lo), np.float32)
        lo_pad[real] = lo[final_order[real]]
        if metric == "l2":
            add = (lo_pad ** 2).sum(-1)
            scale = -2.0
        else:
            add = np.zeros(n_pad, np.float32)
            scale = -1.0
        add[~real] = np.inf
        self.x_lo = jnp.asarray(scale * lo_pad, dtype=scan_dtype)
        self.addvec = jnp.asarray(add)

        # routing table: each cluster's max_probes nearest clusters
        # (including itself, rank 0) by centroid distance
        c2 = ((cent[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        P = min(max_probes, ncent)
        self.neighbors = jnp.asarray(
            np.argsort(c2, axis=1, kind="stable")[:, :P].astype(np.int32))
        self.chunk_mask = jnp.asarray(cmask)
        cent_j = jnp.asarray(cent)
        self.cent = cent_j
        self.cent_sq = jnp.sum(cent_j * cent_j, axis=-1)

        self.base_full = jnp.asarray(base_full)          # ORIGINAL order
        self.base_sq = jnp.sum(self.base_full * self.base_full, axis=-1)
        self.interpret = jax.default_backend() != "tpu"
        pad_frac = 1.0 - n / n_pad
        self.stats = dict(n=n, ncent=int(ncent), n_chunks=self.n_chunks,
                          pack_padding=round(pad_frac, 4),
                          chunks_per_cluster=round(
                              float(cmask.sum(1).mean()), 3))

    def search(self, queries_full, queries_lo=None, *, k: int = 10,
               c: int = 32, probes: int = 16, merge: str = "approx",
               return_kept_frac: bool = False):
        from gbnns_tpu.search.rerank import rerank

        qf = jnp.asarray(queries_full, dtype=jnp.float32)
        ql = qf if queries_lo is None else jnp.asarray(queries_lo,
                                                       dtype=jnp.float32)
        B = ql.shape[0]
        tq = min(self.tq, _round_up(B, 8 if self.interpret else 128))
        order, tile_mask = _plan_queries(
            ql, self.cent, self.cent_sq, self.neighbors, self.chunk_mask,
            self.chain_rank, n_chunks=self.n_chunks, tq=tq, probes=probes)
        Bp = order.shape[0]
        qlp = jnp.pad(ql, ((0, Bp - B), (0, 0)))[order]

        vals, ids = gated_topm_scan(qlp, self.x_lo, self.addvec,
                                    tile_mask, metric=self.metric,
                                    fine=self.fine, m=self.m, sub=self.sub,
                                    chunk=self.chunk, tq=tq,
                                    interpret=self.interpret)
        cc = min(c, vals.shape[1])
        if merge == "approx" and not self.interpret:
            _, sel = jax.lax.approx_max_k(-vals, cc, recall_target=0.95)
        else:
            _, sel = jax.lax.top_k(-vals, cc)
        cand_pos = jnp.take_along_axis(ids, sel, axis=1)
        sel_vals = jnp.take_along_axis(vals, sel, axis=1)
        # +inf winners are skipped-cell sentinels (or packing padding,
        # perm -1): mark invalid so the re-rank's -1 masking drops them
        pid = self.perm[cand_pos]                  # back to original ids
        cand_sorted = jnp.where(jnp.isfinite(sel_vals) & (pid >= 0),
                                pid, -1)
        # unsort the SMALL (B, c) candidate matrix and re-rank in input
        # order — full-dim queries never ride through the sort (two
        # (B, d) gathers saved; the v1 tail measured 35 ms at c=32)
        inv = jnp.argsort(order)
        cand = cand_sorted[inv][:B]
        ids_o, d_o = rerank(qf, self.base_full, cand, k,
                            metric=self.metric, base_sqnorms=self.base_sq)
        if return_kept_frac:
            kept = float(jnp.mean(tile_mask.astype(jnp.float32)))
            return ids_o, d_o, kept
        return ids_o, d_o
