"""Multi-chip sharded search over an ICI device mesh.

Capability: BASELINE.json:11 — "DEEP10M sharded over v4-8: per-chip
subgraphs + ICI all-gather candidate merge". The reference has no
distributed runtime at all (single node, OpenMP — SURVEY.md §5.8); this
module is the TPU-native scale-out the rebuild adds:

  * the base set (both search-space and full-dim vectors) and its kNN graph
    are partitioned into P contiguous shards, one per device; each shard's
    graph is *local* (subgraph over the shard's own vectors with local ids)
    so graph construction is embarrassingly parallel and no chip ever holds
    the full index — index size scales with the mesh;
  * queries are replicated; each chip walks its own subgraph (the same
    lockstep walker as single-chip) and re-ranks its own candidates at full
    dimension locally — so the only inter-chip traffic is one
    ``all_gather`` of (B, k) id/distance pairs over ICI, followed by a
    replicated P*k → k top-k merge (the sharded analog of the
    per-shard-partial-top-k-then-merge pattern, SURVEY §5.7);
  * everything runs inside one ``shard_map`` over a 1-D mesh axis, so XLA
    schedules the collective on ICI links (scaling-book recipe: mesh +
    shardings, collectives inserted at the annotated boundary).

Tested on a forced-8-device CPU mesh (SURVEY §7.4); the same code runs
unchanged on a real v4-8/v5e slice.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gbnns_tpu.build.knn_graph import build_knn_graph
from gbnns_tpu.search.rerank import rerank
from gbnns_tpu.search.walker_jax import beam_search, default_entry_ids


@dataclasses.dataclass
class ShardedIndex:
    """Device-sharded index: leading axis = shard (device)."""

    base_lo: jax.Array     # (Pn, n_shard, d_lo) search-space vectors
    base_full: jax.Array   # (Pn, n_shard, d) full-dim vectors for re-rank
    graph: jax.Array       # (Pn, n_shard, K) local-id subgraph adjacency
    n: int                 # total corpus size (before padding)
    n_shard: int
    mesh: Mesh
    axis: str = "shards"
    # DMA-payload hop data for engine="graph_pallas" (the round-2 fast
    # walker, per shard): packed rows + static decode metadata. None when
    # the index was built with with_payload=False.
    payload: jax.Array | None = None        # (Pn, n_shard, S, 128) f32 view
    payload_meta: tuple | None = None       # (K, d_lo, vec_words, bf16)
    # per-shard centroid entry points (entries.CentroidEntries, sharded):
    cent: jax.Array | None = None           # (Pn, ncent, d_lo)
    cent_sq: jax.Array | None = None        # (Pn, ncent)
    cent_ids: jax.Array | None = None       # (Pn, ncent) int32 LOCAL ids
    # jit cache: one compiled shard_map program per search-parameter tuple,
    # so repeated sweeps/benchmark iterations never re-trace.
    _fns: dict = dataclasses.field(default_factory=dict, repr=False)


def make_mesh(n_devices: int | None = None, axis: str = "shards") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _batched_shard_candidates(base_lo, Pn: int, n_shard: int, K: int, *,
                              metric: str, mesh: Mesh, axis: str,
                              q_chunk: int = 4096) -> np.ndarray:
    """Exact per-shard kNN candidates for ALL shards in ONE device program:
    ``shard_map`` places each shard's O(n_shard²·d) sweep on its own device,
    so the build scales with the mesh instead of running Pn serial sweeps
    through one queue (VERDICT r3 item 9). Inside each shard the node axis
    is streamed in ``q_chunk`` blocks via ``lax.map`` (static shapes; one
    (q_chunk, n_shard) score tile live at a time). Returns (Pn, n_shard,
    kk) int32 LOCAL candidate ids (self included), kk = min(K+1, n_shard).
    """
    kk = min(K + 1, n_shard)
    qc = min(q_chunk, n_shard)
    n_pad = -(-n_shard // qc) * qc
    stacked = jnp.asarray(base_lo.reshape(Pn, n_shard, -1))

    def per_shard(xs):
        x = xs[0]                                   # (n_shard, d)
        xsq = jnp.sum(x * x, axis=-1)
        q = jnp.pad(x, ((0, n_pad - n_shard), (0, 0)))
        q = q.reshape(n_pad // qc, qc, -1)

        def one_chunk(qb):
            dot = qb @ x.T                          # MXU: (qc, n_shard)
            if metric == "l2":
                d = (jnp.sum(qb * qb, -1)[:, None] - 2.0 * dot
                     + xsq[None, :])
            else:                                   # ip / angular
                d = -dot
            _, ids = jax.lax.top_k(-d, kk)
            return ids.astype(jnp.int32)

        ids = jax.lax.map(one_chunk, q)             # (chunks, qc, kk)
        return ids.reshape(1, n_pad, kk)[:, :n_shard]

    fn = jax.jit(jax.shard_map(per_shard, mesh=mesh, in_specs=P(axis),
                               out_specs=P(axis)))
    return np.asarray(fn(stacked))


def build_sharded_index(base_full, K: int, mesh: Mesh, *,
                        base_lo=None, metric: str = "l2",
                        axis: str = "shards", with_graph: bool = True,
                        with_payload: bool = False,
                        vec_dtype: str = "bfloat16", ncent: int = 0,
                        seed: int = 0, parallel_build: bool = True,
                        build_kwargs: dict[str, Any] | None = None) -> ShardedIndex:
    """Partition the corpus into contiguous per-device shards and build an
    independent kNN subgraph per shard (local ids). Shard p owns global ids
    [p*n_shard, (p+1)*n_shard); the tail shard is padded with +inf-distance
    sentinel rows (id slots -1 in the graph are never produced here since
    padding rows only ever neighbor each other).

    ``with_graph=False`` skips the O(n²/P)-per-shard subgraph build for
    indexes that will only ever be scanned (engine="flat") — the graph field
    becomes a zero-width (Pn, n_shard, 0) placeholder.

    ``with_payload=True`` additionally packs each shard's subgraph +
    reduced vectors into DMA-aligned hop rows (walker_pallas.
    pack_hop_payload) and, when ``ncent>0``, fits per-shard centroid
    entry points — the two levers that made the single-chip walker 23x
    faster in round 2, now per shard for ``engine="graph_pallas"``
    (VERDICT r2 item 3: the sharded path used to fall back to the slow
    pure-XLA hop)."""
    base_full = np.asarray(base_full, dtype=np.float32)
    base_lo = base_full if base_lo is None else np.asarray(base_lo, np.float32)
    n, d = base_full.shape
    Pn = mesh.devices.size
    n_shard = -(-n // Pn)
    pad = Pn * n_shard - n
    if pad:
        # Sentinel padding rows. For L2 a far-away constant keeps them out of
        # every neighbor list; for ip/angular a far row would have a huge
        # inner product, so zeros (score 0) are used instead. Either way the
        # search path additionally masks any global id >= n before the merge,
        # so sentinels can never be returned under any metric.
        if metric in ("ip", "angular"):
            fill_full = np.zeros((pad, d), np.float32)
            fill_lo = np.zeros((pad, base_lo.shape[1]), np.float32)
        else:
            far = np.abs(base_full).max() * 1e3 + 1e3
            fill_full = np.full((pad, d), far, np.float32)
            fill_lo = np.full((pad, base_lo.shape[1]), far, np.float32)
        base_full = np.concatenate([base_full, fill_full], axis=0)
        base_lo = np.concatenate([base_lo, fill_lo], axis=0)

    if with_graph:
        kw = dict(build_kwargs or {})
        # the batched path handles the default exact/xla build; anything
        # exotic (approx sweeps, alternate backends) keeps the serial path
        batched = (parallel_build and Pn > 1 and K + 1 <= n_shard
                   and kw.get("exact", True)
                   and kw.get("backend", "xla") == "xla")
        if batched:
            from concurrent.futures import ThreadPoolExecutor

            from gbnns_tpu.build.knn_graph import (_drop_self,
                                                   add_reverse_edges,
                                                   ensure_connected)

            cand = _batched_shard_candidates(
                base_lo, Pn, n_shard, K, metric=metric, mesh=mesh, axis=axis,
                q_chunk=int(kw.get("node_chunk", 4096)))

            def finish(p):
                # host post-processing is O(E) numpy per shard — threaded so
                # BFS/BLAS of shard p overlaps shard p+1 (GIL released in
                # the BLAS sweeps ensure_connected issues)
                g = _drop_self(cand[p], 0)
                g = add_reverse_edges(g, frac=kw.get("reverse_frac", 0.5))
                if kw.get("connect", True):
                    g = ensure_connected(
                        base_lo[p * n_shard:(p + 1) * n_shard], g,
                        metric=metric)
                return g

            with ThreadPoolExecutor(max_workers=min(Pn, 8)) as ex:
                graphs = list(ex.map(finish, range(Pn)))
        else:
            graphs = []
            for p in range(Pn):
                shard = base_lo[p * n_shard:(p + 1) * n_shard]
                graphs.append(build_knn_graph(shard, K, metric=metric, **kw))
        graph = np.stack(graphs)  # (Pn, n_shard, K) local ids
    else:
        graph = np.zeros((Pn, n_shard, 0), np.int32)

    payload = payload_meta = cent = cent_sq = cent_ids = None
    if with_payload:
        if not with_graph:
            raise ValueError("with_payload=True needs with_graph=True")
        from concurrent.futures import ThreadPoolExecutor

        from gbnns_tpu.search.walker_pallas import pack_hop_payload

        def pack(p):
            return pack_hop_payload(graph[p],
                                    base_lo[p * n_shard:(p + 1) * n_shard],
                                    vec_dtype=vec_dtype)

        with ThreadPoolExecutor(max_workers=min(Pn, 8)) as ex:
            hps = list(ex.map(pack, range(Pn)))
        payload_meta = (hps[0].K, hps[0].d, hps[0].vec_words, hps[0].bf16)
        payload = np.stack([np.asarray(hp.data) for hp in hps])
    if ncent:
        from gbnns_tpu.search.entries import CentroidEntries

        cs, cqs, cis = [], [], []
        for p in range(Pn):
            ce = CentroidEntries.build(
                base_lo[p * n_shard:(p + 1) * n_shard], ncent=ncent,
                metric=metric, seed=seed + p)
            cs.append(np.asarray(ce.centroids))
            cqs.append(np.asarray(ce.cent_sq))
            cis.append(np.asarray(ce.node_ids))
        cent, cent_sq = np.stack(cs), np.stack(cqs)
        cent_ids = np.stack(cis).astype(np.int32)

    shard_spec = NamedSharding(mesh, P(axis))
    put = lambda a: None if a is None else jax.device_put(a, shard_spec)
    return ShardedIndex(
        base_lo=jax.device_put(base_lo.reshape(Pn, n_shard, -1), shard_spec),
        base_full=jax.device_put(base_full.reshape(Pn, n_shard, -1), shard_spec),
        graph=jax.device_put(graph, shard_spec),
        n=n, n_shard=n_shard, mesh=mesh, axis=axis,
        payload=put(payload), payload_meta=payload_meta,
        cent=put(cent), cent_sq=put(cent_sq), cent_ids=put(cent_ids),
    )


def sharded_search(index: ShardedIndex, queries, k: int, *, ef: int,
                   num_entries: int = 32, max_hops: int = 256,
                   metric: str = "l2", engine: str = "graph",
                   queries_full=None, scan_dtype: str = "bfloat16",
                   rerank_metric: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Search all shards in parallel and merge: returns (ids, dists) with
    *global* ids, (B, k) each. One jit'd shard_map program: per-shard
    candidate generation (``engine="graph"``: lockstep beam walk over the
    local subgraph; ``engine="flat"``: MXU scan of the local shard) →
    per-shard full-dim re-rank → all_gather(B*k scalars) over ICI →
    replicated merge.

    ``queries`` are in the search (reduced) space; pass ``queries_full``
    whenever the index was built with a reduced ``base_lo`` so the re-rank
    gets the original-dimension vectors.

    ``engine="graph_pallas"`` walks each shard with the round-2 fast hop
    (DMA payload rows + per-shard centroid entries when the index carries
    them) — the single-chip flagship walker, sharded. Requires an index
    built with ``with_payload=True``.
    """
    if engine not in ("graph", "flat", "fused", "graph_pallas"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "graph" and index.graph.shape[-1] == 0:
        raise ValueError("index was built with with_graph=False; "
                         "rebuild with with_graph=True for engine='graph'")
    if engine == "graph_pallas" and index.payload is None:
        raise ValueError("index was built without hop payloads; rebuild "
                         "with with_payload=True for engine='graph_pallas'")
    axis = index.axis
    rr_metric = rerank_metric or metric
    cache_key = (k, ef, num_entries, max_hops, metric, rr_metric, engine,
                 scan_dtype)
    qj = jnp.asarray(np.asarray(queries, dtype=np.float32))
    qfj = (qj if queries_full is None
           else jnp.asarray(np.asarray(queries_full, dtype=np.float32)))
    if qfj.shape[1] != index.base_full.shape[-1]:
        raise ValueError(
            f"re-rank needs full-dim queries: got {qfj.shape[1]}, index full "
            f"dim is {index.base_full.shape[-1]} (pass queries_full=...)")
    extras = ()
    has_cent = index.cent is not None
    if engine == "graph_pallas":
        extras = (index.payload,) + (
            (index.cent, index.cent_sq, index.cent_ids) if has_cent else ())
    if cache_key in index._fns:
        ids, dists = index._fns[cache_key](qj, qfj, index.base_lo,
                                           index.base_full, index.graph,
                                           *extras)
        return ids, dists
    entry = default_entry_ids(index.n_shard, min(num_entries, ef))

    # fused engine: static per-shard binned-scan geometry (shapes must be
    # chosen at trace time; the shard size is known from the index)
    if engine == "fused":
        n_shard = index.n_shard
        f_chunk = min(16384, max(128, 1 << (n_shard - 1).bit_length()))
        # round DOWN to a power of two so f_bin always divides the
        # power-of-two f_chunk and never collapses below the floor (a
        # non-power-of-two ef like 48 used to drive f_bin to 2, blowing
        # the bin-winner arrays up to (B, n_pad/2) — multi-GB at 1M shards)
        f_bin = max(8, min(1024, f_chunk // max(8, ef)))
        f_bin = 1 << (f_bin.bit_length() - 1)
        f_pad = -(-n_shard // f_chunk) * f_chunk
        f_interp = jax.default_backend() != "tpu"

    def per_shard(q, q_full, base_lo, base_full, graph, *extra):
        base_lo, base_full, graph = base_lo[0], base_full[0], graph[0]
        if engine == "graph_pallas":
            # per-shard DMA-payload hop + centroid entries: the single-chip
            # flagship walker (graph_index.GraphIndex), inside shard_map
            from gbnns_tpu.kernels.distance import pairwise_dists
            from gbnns_tpu.search.walker_pallas import (HopPayload,
                                                        beam_search_pallas)

            K_, d_, vw_, bf16_ = index.payload_meta
            payload = HopPayload(data=extra[0][0], n=index.n_shard, K=K_,
                                 d=d_, vec_words=vw_, bf16=bf16_)
            if has_cent:
                c, csq, cid = extra[1][0], extra[2][0], extra[3][0]
                cd = pairwise_dists(q, c, metric=metric, x_sqnorms=csq,
                                    precision="default")
                E = min(num_entries, ef, c.shape[0])
                _, sel = jax.lax.approx_max_k(-cd, E, recall_target=0.95)
                ent = cid[sel]                     # (B, E) local start nodes
            else:
                ent = entry
            res = beam_search_pallas(q, payload, base_lo, ent, ef=ef,
                                     metric=metric, max_hops=max_hops)
            ids, dists = rerank(q_full, base_full, res.ids, k,
                                metric=rr_metric)
        elif engine == "fused":
            # per-shard fused Pallas binned scan (the single-chip flagship
            # engine, sharded): scores never leave VMEM; only the shard's
            # top-ef candidates are re-ranked and merged over ICI
            from gbnns_tpu.kernels.scan_topk_pallas import (binned_scan,
                                                            merge_topc)

            pad = f_pad - base_lo.shape[0]
            scale = -2.0 if metric == "l2" else -1.0
            if scan_dtype == "int8":
                # per-shard symmetric int8 (2x MXU rate): per-shard corpus
                # scale + per-query query scale ride in qshift's dequant
                # factor; the per-shard full-dim re-rank runs BEFORE the
                # cross-shard merge, so shard-local quantization never
                # compares across shards.
                sxs = 127.0 / jnp.maximum(jnp.max(jnp.abs(base_lo)), 1e-30)
                xi = jnp.clip(jnp.round(base_lo * sxs),
                              -127, 127).astype(jnp.int8)
                x_pad = jnp.pad(xi, ((0, pad), (0, 0)))
                xqs = jnp.sum((xi.astype(jnp.float32) / sxs) ** 2, axis=-1)
                add = jnp.pad(xqs if metric == "l2" else jnp.zeros_like(xqs),
                              ((0, pad),), constant_values=jnp.inf)
                sqq = 127.0 / jnp.maximum(jnp.max(jnp.abs(q), axis=1), 1e-30)
                q_scan = jnp.clip(jnp.round(q * sqq[:, None]),
                                  -127, 127).astype(jnp.int8)
                skw = dict(qshift=scale / (sxs * sqq), quant=True)
            else:
                sq = jnp.sum(base_lo * base_lo, axis=-1)
                # prescaled corpus: the distance scale rides in the matmul
                # (exact bf16 exponent shift)
                x_pad = jnp.pad(scale * base_lo,
                                ((0, pad), (0, 0))).astype(jnp.bfloat16)
                add = jnp.pad(sq if metric == "l2" else jnp.zeros_like(sq),
                              ((0, pad),), constant_values=jnp.inf)
                q_scan, skw = q, dict(prescaled=True)
            raw_v, raw_i = binned_scan(q_scan, x_pad, add, metric=metric,
                                       bin_size=f_bin, chunk=f_chunk,
                                       tq=min(512, q.shape[0]),
                                       interpret=f_interp,
                                       transpose=False, **skw)
            # merge_topc consumes the scan's native bin-major layout —
            # same pallas top-c extraction the single-chip flagship uses
            # (28.84 vs 35.27 ms/batch at 1M x 16k, tail_decomp_1m.jsonl)
            cc = min(ef, raw_v.shape[0])
            _, cand = merge_topc(raw_v, raw_i, cc, valid_b=q.shape[0],
                                 interpret=f_interp)
            ids, dists = rerank(q_full, base_full, cand, k, metric=rr_metric)
        elif engine == "flat":
            from gbnns_tpu.kernels.topk import knn_chunked
            _, cand = knn_chunked(q, base_lo, ef, metric=metric,
                                  chunk=65536, exact=False,
                                  precision="default")
            ids, dists = rerank(q_full, base_full, cand, k, metric=rr_metric)
        else:
            res = beam_search(q, base_lo, graph, entry, ef=ef, metric=metric,
                              max_hops=max_hops)
            ids, dists = rerank(q_full, base_full, res.ids, k,
                                metric=rr_metric)
        shard_id = jax.lax.axis_index(axis)
        gids = jnp.where(ids >= 0, ids + shard_id * index.n_shard, -1)
        # mask sentinel padding rows (global id >= n) under every metric
        valid = (ids >= 0) & (gids < index.n)
        gids = jnp.where(valid, gids, -1)
        dists = jnp.where(valid, dists, jnp.inf)
        all_ids = jax.lax.all_gather(gids, axis)      # (Pn, B, k)
        all_d = jax.lax.all_gather(dists, axis)
        Pn = all_ids.shape[0]
        B = q.shape[0]
        flat_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(B, Pn * k)
        flat_d = jnp.transpose(all_d, (1, 0, 2)).reshape(B, Pn * k)
        neg, sel = jax.lax.top_k(-flat_d, k)
        out_ids = jnp.take_along_axis(flat_ids, sel, axis=1)
        return out_ids, -neg

    # check_vma=False: the walker's while_loop carries fresh constants
    # (counters, flags) that start axis-unvarying and become varying after a
    # body step, which the VMA type-checker rejects even though the program
    # is correct; disabling the static check keeps the collective lowering.
    fn = jax.jit(jax.shard_map(
        per_shard, mesh=index.mesh,
        in_specs=(P(), P()) + (P(axis),) * (3 + len(extras)),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    index._fns[cache_key] = fn
    ids, dists = fn(qj, qfj, index.base_lo, index.base_full, index.graph,
                    *extras)
    return ids, dists
