"""Lockstep beam graph search with a Pallas DMA-gather hop — the TPU-native
fused walker (BASELINE.json:5 north star; SURVEY §7.2 step 6).

Same search semantics as ``walker_jax.beam_search`` (parity-gated in
tests/test_walker_pallas.py): entry seed → per-hop frontier expansion →
bounded ef pool → stop when no unexpanded candidate can improve the pool
(reference behavior per SURVEY §4.3). What changes is the hot op. Each
hop must fetch, for every expanded node, its adjacency row and the K
neighbor vectors+norms — random 4 KB-class reads from HBM. The round-1
walker did this with ``jnp.take``, which on v5e is byte-rate-bound at
~4.2 GB/s; this walker packs all per-node hop data into ONE tile-aligned
payload row

    payload[v] = [ vecs of graph[v] (K x d, f32 or bf16)
                   | graph[v] (K int32) | pad → multiple of 4 KB ]

and fetches it with ``kernels.gather_pallas.dma_row_gather`` (one async
DMA per expanded node, 32 in flight, 51 GB/s measured — ~12x the XLA
gather). Beam maintenance (top-ef merge, dedup, termination) stays in
XLA, where batched sorts are already MXU/VPU-shaped: the kernel fuses
exactly the part XLA lowers badly, nothing more.

The bf16 payload halves DMA bytes; vectors are *stored* rounded but
distances still accumulate in f32 (storage rounding shifts scores by
~2^-8 relative — candidate selection absorbs it and the full-dim re-rank
restores exact order, same argument as the fused scan's bin quantization).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gbnns_tpu.kernels.distance import METRICS, squared_norms
from gbnns_tpu.kernels.gather_pallas import dma_row_gather
from gbnns_tpu.search.walker_jax import (SearchResult, _batched_dists,
                                         intra_dedup_mask, merge_pool,
                                         select_frontier)

_INF = float("inf")
_ROW_WORDS = 1024  # (8, 128) f32 tile = one 4 KB DMA unit


@dataclasses.dataclass(frozen=True)
class HopPayload:
    """Device-resident packed hop data: one row per node (see module doc)."""

    data: jax.Array      # (n, words/128, 128) f32 container
    n: int
    K: int
    d: int
    vec_words: int       # f32 words holding the K x d neighbor vectors
    bf16: bool

    @property
    def words(self) -> int:
        return self.data.shape[1] * 128


def pack_hop_payload(graph, base_lo, *, vec_dtype: str = "float32",
                     node_chunk: int = 131072) -> HopPayload:
    """Pack adjacency + neighbor vectors into DMA-aligned rows.

    Norms are NOT stored: they are recomputed on device from the decoded
    vectors with the exact ``squared_norms`` op the pure-JAX walker uses,
    which keeps the two walkers bit-identical (host-side accumulation
    order differs measurably from the device's).

    Memory cost: K x the corpus (f32) or K/2 x (bf16) plus padding to the
    4 KB tile — the standard neighbor-inlining trade (CAGRA-class engines
    make the same one); for SIFT1M-like (n=1M, K=32, d'=32, bf16) the
    payload is 4 GB of HBM.
    """
    if vec_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"vec_dtype must be float32|bfloat16, got {vec_dtype!r}")
    bf16 = vec_dtype == "bfloat16"
    graph = np.asarray(graph, np.int32)
    base = np.asarray(base_lo, np.float32)
    n, K = graph.shape
    d = base.shape[1]
    if bf16 and (K * d) % 2:
        raise ValueError("bf16 payload needs K*d even")
    vec_words = (K * d) // 2 if bf16 else K * d
    words = -(-(vec_words + K) // _ROW_WORDS) * _ROW_WORDS
    cont = np.zeros((n, words), np.float32)
    if bf16:
        import ml_dtypes
    for lo in range(0, n, node_chunk):
        hi = min(lo + node_chunk, n)
        g = graph[lo:hi]
        vecs = base[g]                                   # (c, K, d) f32
        if bf16:
            v = vecs.astype(ml_dtypes.bfloat16).reshape(hi - lo, K * d)
            cont[lo:hi, :vec_words] = v.view(np.float32)
        else:
            cont[lo:hi, :vec_words] = vecs.reshape(hi - lo, K * d)
        cont[lo:hi, vec_words:vec_words + K] = g.view(np.float32)
    data = jnp.asarray(cont.reshape(n, words // 128, 128))
    return HopPayload(data=data, n=n, K=K, d=d, vec_words=vec_words,
                      bf16=bf16)


def _decode(raw, *, K: int, d: int, vec_words: int, bf16: bool):
    """(R, S, 128) f32 container rows → (vecs (R,K,d) f32, sq (R,K),
    ids (R,K) int32). Bitcast layout matches numpy's little-endian .view.

    Test/debug helper — the hop itself uses ``_hop_dists``, which never
    materializes the (R, K, d) vector tensor (see its docstring)."""
    R = raw.shape[0]
    flat = raw.reshape(R, -1)
    vw = flat[:, :vec_words]
    if bf16:
        vecs = jax.lax.bitcast_convert_type(vw, jnp.bfloat16).reshape(R, K, d)
        vecs = vecs.astype(jnp.float32)
    else:
        vecs = vw.reshape(R, K, d)
    sq = squared_norms(vecs)
    ids = jax.lax.bitcast_convert_type(flat[:, vec_words:vec_words + K],
                                       jnp.int32)
    return vecs, sq, ids


def _hop_dists(raw, qf, q_sq, *, B: int, M: int, K: int, d: int,
               vec_words: int, bf16: bool, metric: str, precision: str):
    """Distances + neighbor ids straight from the raw payload rows:
    (dist (B, M*K) f32, ids (B, M*K) int32).

    The naive decode (bitcast → reshape to (R, K, d) → f32 einsum) costs
    ~28 ms per hop at B=8192/M=4 on v5e: the reshape crosses the bitcast's
    trailing pair axis, which Mosaic lowers as a full lane-shuffle
    relayout. Contracting the pair layout directly ("bktp,btp->bk",
    measured 3.5 ms) or pure leading-axis reshapes for f32 (3.0 ms) keeps
    every reshape layout-trivial."""
    flat = raw.reshape(B, M, -1)[..., :vec_words].reshape(B, M * vec_words)
    ids = jax.lax.bitcast_convert_type(
        raw.reshape(B, M, -1)[..., vec_words:vec_words + K],
        jnp.int32).reshape(B, M * K)
    if bf16:
        vb = jax.lax.bitcast_convert_type(flat, jnp.bfloat16)  # (B, MvW, 2)
        vb = vb.reshape(B, M * K, d // 2, 2)
        qb = qf.astype(jnp.bfloat16).reshape(B, d // 2, 2)
        dots = jnp.einsum("bktp,btp->bk", vb, qb,
                          preferred_element_type=jnp.float32)
        if metric in ("ip", "angular"):
            return -dots, ids
        sq = jnp.einsum("bktp,bktp->bk", vb, vb,
                        preferred_element_type=jnp.float32)
        return jnp.maximum(q_sq[:, None] - 2.0 * dots + sq, 0.0), ids
    vecs = flat.reshape(B, M * K, d)
    sq = squared_norms(vecs)
    dist = _batched_dists(qf, vecs, sq, q_sq, metric, precision=precision)
    return dist, ids


@functools.partial(
    jax.jit,
    static_argnames=("ef", "max_hops", "metric", "precision", "expand",
                     "intra_dedup", "K", "d", "vec_words", "bf16",
                     "interpret", "visited_mode"),
)
def _beam_search_payload(queries, payload_data, base_lo, entry_ids, *,
                         ef: int, max_hops: int, metric: str,
                         precision: str, expand: int, intra_dedup: bool,
                         K: int, d: int, vec_words: int, bf16: bool,
                         interpret: bool,
                         visited_mode: str = "beam") -> SearchResult:
    B = queries.shape[0]
    E = entry_ids.shape[-1]
    n = base_lo.shape[0]
    if E > ef:
        raise ValueError(f"entry count {E} > ef {ef}")
    M = max(1, min(expand, ef))

    qf = queries.astype(jnp.float32)
    q_sq = squared_norms(qf)

    # ---- seed the pool with shared (E,) or per-query (B, E) entries ----
    base_f32 = base_lo.astype(jnp.float32)
    if entry_ids.ndim == 2:
        e_ids = entry_ids.astype(jnp.int32)
        e_vecs = base_f32[e_ids]
        e_sq = squared_norms(e_vecs)
    else:
        e_ids = jnp.broadcast_to(entry_ids[None, :].astype(jnp.int32), (B, E))
        e_vecs = jnp.broadcast_to(base_f32[entry_ids], (B, E, d))
        e_sq = jnp.broadcast_to(squared_norms(base_f32[entry_ids])[None, :],
                                (B, E))
    e_d = _batched_dists(qf, e_vecs, e_sq, q_sq, metric, precision=precision)
    pad = ef - E
    beam_ids = jnp.pad(e_ids, ((0, 0), (0, pad)), constant_values=-1)
    beam_d = jnp.pad(e_d, ((0, 0), (0, pad)), constant_values=jnp.inf)
    order = jnp.argsort(beam_d, axis=1)
    beam_ids = jnp.take_along_axis(beam_ids, order, axis=1)
    beam_d = jnp.take_along_axis(beam_d, order, axis=1)
    expanded = beam_ids < 0

    if visited_mode == "exact":
        # (B, n) byte table in HBM — identical semantics (and identical
        # update ops) to walker_jax(visited_mode="exact"), so the payload
        # walker is bit-gateable against the C++ oracle (VERDICT r3 weak 7).
        # max() not set(): -1 padding clamps to index 0 (see walker_jax).
        visited = jnp.zeros((B, n), dtype=jnp.bool_)
        rows0 = jnp.arange(B, dtype=jnp.int32)
        visited = visited.at[rows0[:, None], jnp.maximum(beam_ids, 0)].max(
            beam_ids >= 0)
    else:
        visited = jnp.zeros((B, 1), dtype=jnp.bool_)  # unused placeholder

    rows_b = jnp.arange(B, dtype=jnp.int32)[:, None]
    n_dist = jnp.full((B,), E, dtype=jnp.int32)
    state = (beam_ids, beam_d, expanded, visited, n_dist, jnp.int32(0),
             jnp.bool_(True))

    def cond(state):
        *_, hop, any_active = state
        return (hop < max_hops) & any_active

    def body(state):
        beam_ids, beam_d, expanded, visited, n_dist, hop, _ = state

        # -- frontier: first M unexpanded entries of the sorted pool -----
        f_ids, live, expanded = select_frontier(beam_ids, beam_d, expanded, M)

        # -- THE HOT OP: one 4 KB-class DMA per expanded node ------------
        raw = dma_row_gather(payload_data, f_ids.reshape(B * M),
                             interpret=interpret)
        dist, nid = _hop_dists(raw, qf, q_sq, B=B, M=M, K=K, d=d,
                               vec_words=vec_words, bf16=bf16, metric=metric,
                               precision=precision)
        nbrs = jnp.where(jnp.repeat(live, K, axis=1), nid, -1)

        # -- dedup / pool merge: identical to walker_jax ------------------
        dup = jnp.any(nbrs[:, :, None] == beam_ids[:, None, :], axis=-1)
        if M > 1 and intra_dedup:
            dup = dup | intra_dedup_mask(nbrs, M * K)
        if visited_mode == "exact":
            nbrs_safe = jnp.maximum(nbrs, 0)
            dup = dup | visited[rows_b, nbrs_safe]
            visited = visited.at[rows_b, nbrs_safe].max(nbrs >= 0)
        invalid = (nbrs < 0) | dup
        cand_d = jnp.where(invalid, _INF, dist)
        n_dist = n_dist + jnp.sum(~invalid, axis=1).astype(jnp.int32)

        beam_ids, beam_d, expanded = merge_pool(
            beam_ids, beam_d, expanded, nbrs, cand_d, invalid, ef)

        any_active = jnp.any(~expanded)
        return (beam_ids, beam_d, expanded, visited, n_dist, hop + 1,
                any_active)

    beam_ids, beam_d, expanded, visited, n_dist, hops, _ = \
        jax.lax.while_loop(cond, body, state)
    return SearchResult(ids=beam_ids, dists=beam_d, n_dist=n_dist, hops=hops)


def beam_search_pallas(queries, payload: HopPayload, base_lo, entry_ids, *,
                       ef: int, max_hops: int = 256, metric: str = "l2",
                       precision: str = "highest", expand: int = 4,
                       intra_dedup: bool = True,
                       visited_mode: str = "beam",
                       interpret: bool | None = None) -> SearchResult:
    """Pallas-hop lockstep beam search. Drop-in for
    ``walker_jax.beam_search``: same pool semantics, same knobs;
    ``base_lo`` is used only to seed the entry points.

    ``visited_mode="exact"`` keeps the reference's (B, n) per-query visited
    table (same HBM byte table and update ops as walker_jax) so the payload
    walker can be gated bit-exactly against the C++ oracle — a parity mode,
    not the serving default: the table costs a (B, MK) gather + scatter per
    hop. With ``expand=1`` and an f32 payload the expansion order matches
    the scalar reference exactly. ``"beam"`` (default) uses pool membership
    as the visited filter (CAGRA-style; revisits cost extra distance evals,
    never wrong results).

    ``interpret=None`` auto-selects the Mosaic interpreter off-TPU so the
    CPU test suite exercises the identical program.
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    if visited_mode not in ("beam", "exact"):
        raise ValueError(f"unknown visited_mode {visited_mode!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _beam_search_payload(
        jnp.asarray(queries), payload.data, jnp.asarray(base_lo),
        jnp.asarray(entry_ids, jnp.int32), ef=ef, max_hops=max_hops,
        metric=metric, precision=precision, expand=expand,
        intra_dedup=intra_dedup, K=payload.K, d=payload.d,
        vec_words=payload.vec_words, bf16=payload.bf16, interpret=interpret,
        visited_mode=visited_mode)
