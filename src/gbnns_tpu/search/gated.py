"""Cluster-gated fused scan — the round-3 structural attack on the scan
engine's MXU-output-rate floor.

The round-3 epilogue study (results/epilogue_study_1m.jsonl) settled where
the fused binned scan's time goes at 1M x 16k: the matmul ALONE is 27.6 ms
of the 30.3 ms kernel — at d'=32 the MXU is output-rate-bound (~5.8e11
scores/s), so no epilogue tuning can buy more than ~10%. The only >1.5x
lever is computing FEWER scores. IVF does that by bucketing, and loses on
TPU (45k QPS vs 406k — gather/bucketing overhead, results/BENCH_r02); this
module does it with zero gathers and fully static shapes:

  offline   k-means the corpus, REORDER it cluster-major (one permutation),
            record each cluster's [first, last] corpus-chunk span;
  at query  (1) one thin (B, ncent) centroid matmul; (2) take each query's
            top-``probes`` clusters; (3) SORT the query batch by primary
            cluster so nearby queries share tiles; (4) build a per-
            (corpus-chunk x query-tile) keep mask — a cell is kept iff ANY
            query in the tile probes ANY cluster in the chunk; (5) run the
            same binned Pallas scan with whole cells skipped via scalar-
            prefetched gating, taking each kept chunk's TOP-M candidates
            in-kernel (kernels.scan_topk_pallas.gated_topm_scan);
            (6) merge chunk winners -> top-c, permute back to original ids,
            exact full-dim re-rank, unsort.

Recall semantics are IVF-probes at chunk granularity (a kept chunk scans
every row in it, so recall >= an IVF with the same probes); the knob is
``probes``. Skipped fraction depends on how clustered the corpus and
queries are — the same property the reference's datasets (SIFT/GIST/GloVe)
have and the synthetic stand-ins model (SURVEY §8.2.5).

Reference capability: this supersedes nothing — it is the TPU-native
answer to the reference's "make per-distance cost cheap" goal (SURVEY §1
item 2) at corpus scale, beyond the reference's own design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gbnns_tpu.kernels.scan_topk_pallas import _round_up, gated_topm_scan


@functools.partial(jax.jit, static_argnames=("n_chunks", "tq", "probes"))
def _plan_queries(ql, cent, cent_sq, clo, chi, *, n_chunks: int, tq: int,
                  probes: int):
    """Device-side query planning: sort order + per-tile chunk keep mask.

    Returns (order (Bp,) int32 — sorted-query -> padded-input row,
    tile_mask (n_chunks * Bp/tq,) int32). Padding rows (>= B) sort to the
    end (primary key ncent) and keep nothing.
    """
    B = ql.shape[0]
    Bp = order_pad = -(-B // tq) * tq
    # (B, ncent) centroid distances: ||c||^2 - 2 q.c (per-query constant
    # ||q||^2 dropped — cannot change a per-query ranking)
    d = cent_sq[None, :] - 2.0 * (ql @ cent.T)
    P = min(probes, cent.shape[0])
    _, top = jax.lax.top_k(-d, P)                       # (B, P) cluster ids
    primary = top[:, 0].astype(jnp.int32)
    ncent = cent.shape[0]
    primary_pad = jnp.full((Bp,), ncent, jnp.int32).at[:B].set(primary)
    order = jnp.argsort(primary_pad).astype(jnp.int32)  # (Bp,)

    # per-query chunk intervals from the probed clusters' spans
    lo = clo[top]                                        # (B, P)
    hi = chi[top]
    j = jnp.arange(n_chunks, dtype=jnp.int32)
    keep_q = ((j[None, None, :] >= lo[:, :, None])
              & (j[None, None, :] <= hi[:, :, None])).any(axis=1)  # (B, nc)
    keep_pad = jnp.zeros((Bp, n_chunks), jnp.bool_).at[:B].set(keep_q)
    keep_sorted = keep_pad[order]                        # (Bp, n_chunks)
    tile_keep = keep_sorted.reshape(Bp // tq, tq, n_chunks).any(axis=1)
    # kernel layout: entry j * b_tiles + i
    return order, tile_keep.T.reshape(-1).astype(jnp.int32)


class GatedScanIndex:
    """Drop-in alternative to FusedScanIndex with cluster gating.

    Same (reduced-space scan -> exact full-dim re-rank) contract; two
    recall knobs: ``c`` (re-rank pool, as in FusedScanIndex) and
    ``probes`` (clusters scanned per query, as in IVF).
    """

    def __init__(self, base_full, base_lo=None, *, metric: str = "l2",
                 ncent: int | None = None, scan_dtype=jnp.bfloat16,
                 fine: int = 32, m: int = 16, sub: int = 1024,
                 chunk: int = 16384, tq: int = 1024,
                 seed: int = 0, kmeans_iters: int = 8,
                 kmeans_sample: int | None = 262_144):
        from gbnns_tpu.build.kmeans import kmeans_assign, kmeans_fit

        if metric not in ("l2", "ip", "angular"):
            raise ValueError(f"unknown metric {metric!r}")
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
            # default: ~one cluster per corpus chunk. Gating works at chunk
            # granularity, so chunk-sized clusters maximize skippable cells;
            # the within-chunk fine bins + top-m handle in-cluster recall.
            ncent = -(-n // chunk)
        ncent = max(8, min(ncent, n))

        cent = kmeans_fit(lo, ncent, iters=kmeans_iters, seed=seed,
                          sample=kmeans_sample)
        assign = kmeans_assign(lo, cent)
        order = np.argsort(assign, kind="stable")        # cluster-major
        assign_s = assign[order]

        n_pad = _round_up(n, chunk)
        self.n_chunks = n_pad // chunk
        # Within-chunk fine-bin interleave. Cluster-major order makes a
        # query's true neighbors CONTIGUOUS — they would share one fine bin,
        # which keeps a single winner (measured: R@10 0.61 at full probes).
        # Transposing each chunk's (fine, chunk/fine) position grid sends
        # consecutive cluster rows to consecutive fine bins while leaving
        # chunk membership — the gating granularity — unchanged; the
        # kernel's per-chunk top-m then recovers up to m co-located
        # neighbors per chunk.
        nbc = chunk // fine
        newpos = np.arange(n_pad)
        local = newpos % chunk
        src_local = (local % fine) * nbc + local // fine
        src = (newpos // chunk) * chunk + src_local
        order_pad = np.full(n_pad, -1, np.int64)
        order_pad[:n] = order
        final_order = order_pad[src]           # (n_pad,) orig id or -1
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

        # per-cluster chunk span (contiguous after the cluster-major sort)
        chunk_id = (np.arange(n) // chunk).astype(np.int32)
        clo = np.full(ncent, self.n_chunks, np.int32)
        chi = np.full(ncent, -1, np.int32)
        np.minimum.at(clo, assign_s, chunk_id)
        np.maximum.at(chi, assign_s, chunk_id)
        empty = chi < 0
        if empty.any():
            # an empty cluster can still be some query's nearest centroid:
            # inherit the span of its nearest NON-empty cluster so gating
            # never strands a query with zero kept chunks
            ne = np.flatnonzero(~empty)
            d2 = ((cent[empty][:, None, :] - cent[ne][None, :, :]) ** 2
                  ).sum(-1)
            nearest = ne[np.argmin(d2, axis=1)]
            clo[empty] = clo[nearest]
            chi[empty] = chi[nearest]
        self.cluster_lo = jnp.asarray(clo)
        self.cluster_hi = jnp.asarray(chi)
        cent_j = jnp.asarray(cent)
        self.cent = cent_j
        self.cent_sq = jnp.sum(cent_j * cent_j, axis=-1)

        self.base_full = jnp.asarray(base_full)          # ORIGINAL order
        self.base_sq = jnp.sum(self.base_full * self.base_full, axis=-1)
        self.interpret = jax.default_backend() != "tpu"
        self.stats = dict(n=n, ncent=int(ncent), n_chunks=self.n_chunks,
                          empty_clusters=int(empty.sum()))

    def search(self, queries_full, queries_lo=None, *, k: int = 10,
               c: int = 32, probes: int = 32, merge: str = "approx",
               return_kept_frac: bool = False):
        from gbnns_tpu.search.rerank import rerank

        qf = jnp.asarray(queries_full, dtype=jnp.float32)
        ql = qf if queries_lo is None else jnp.asarray(queries_lo,
                                                       dtype=jnp.float32)
        B = ql.shape[0]
        tq = min(self.tq, _round_up(B, 8 if self.interpret else 128))
        order, tile_mask = _plan_queries(
            ql, self.cent, self.cent_sq, self.cluster_lo, self.cluster_hi,
            n_chunks=self.n_chunks, tq=tq, probes=probes)
        Bp = order.shape[0]
        qlp = jnp.pad(ql, ((0, Bp - B), (0, 0)))[order]
        qfp = jnp.pad(qf, ((0, Bp - B), (0, 0)))[order]

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
        # +inf winners are skipped-cell sentinels (or corpus padding,
        # perm -1): mark invalid so the re-rank's -1 masking drops them
        pid = self.perm[cand_pos]                  # back to original ids
        cand = jnp.where(jnp.isfinite(sel_vals) & (pid >= 0), pid, -1)
        ids_s, d_s = rerank(qfp, self.base_full, cand, k,
                            metric=self.metric, base_sqnorms=self.base_sq)
        inv = jnp.argsort(order)                   # unsort to input order
        out = ids_s[inv][:B], d_s[inv][:B]
        if return_kept_frac:
            kept = float(jnp.mean(tile_mask.astype(jnp.float32)))
            return out[0], out[1], kept
        return out
