"""Batched lockstep greedy/beam graph search — pure-JAX reference walker.

Capability parity: the reference's C++ beam searcher (SURVEY.md §4.3): entry
point → iterative best-first walk over the kNN graph, bounded candidate pool
of size ``ef``, visited handling, termination when the best unexpanded
candidate is worse than the worst pooled one; distances evaluated in the
(possibly reduced) search space. The reference parallelizes with one OpenMP
thread per query; here **all B queries advance in lockstep** as one batched
XLA program — every hop is a handful of large fused ops (gather, batched
dot, compare, top-k), which is the TPU-native shape of query parallelism
(BASELINE.json:5 "hundreds of walks advance in lockstep").

Design choices vs. the scalar reference:
  * Termination: per-query ``active`` flags inside a single
    ``lax.while_loop`` whose trip count is data-dependent but bounded by
    ``max_hops`` — finished walks become no-ops (SURVEY §7.3 "lockstep
    divergence").
  * Visited set: two modes (SURVEY §7.3 "visited set on TPU").
    ``"beam"`` (default, CAGRA-style): membership in the candidate pool is
    the visited filter; a node evicted from the pool may be re-evaluated
    (extra distance computations, never wrong results).
    ``"exact"``: a (B, n) byte table in HBM exactly reproduces the
    reference's per-query visited semantics — used for oracle parity tests
    and small corpora.
  * Distance-computation counters are carried in-graph (the reference's
    comparison metric, SURVEY §5.1).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from gbnns_tpu.kernels.distance import METRICS, squared_norms

_INF = float("inf")  # python float: device-array constants in jit are pathological on axon


def default_entry_ids(n: int, num_entries: int = 32) -> jnp.ndarray:
    """Strided sample of entry points. An exact kNN graph is directed and can
    be disconnected (one component per cluster), so a single entry point caps
    reachable recall; seeding the pool with spread-out entries restores
    reachability and costs nothing extra in the lockstep walker (they are
    just initial pool entries). Deterministic for reproducibility."""
    num_entries = min(num_entries, n)
    return (jnp.arange(num_entries, dtype=jnp.int32) * (n // num_entries)
            + (n // (2 * num_entries)))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SearchResult:
    """Final candidate pool per query, sorted ascending by search-space
    distance, plus work counters."""

    ids: jax.Array       # (B, ef) int32; -1 marks an unfilled slot
    dists: jax.Array     # (B, ef) float32 in the search (low-d) space
    n_dist: jax.Array    # (B,) int32 — distance computations performed
    hops: jax.Array      # () int32 — lockstep hops executed


def _batched_dists(q, vecs, vec_sqnorms, q_sqnorms, metric, precision=None):
    """Distances from q (B,d) to vecs (B,K,d): one batched MXU contraction."""
    dots = jnp.einsum("bd,bkd->bk", q, vecs,
                      preferred_element_type=jnp.float32, precision=precision)
    if metric in ("ip", "angular"):
        return -dots
    return jnp.maximum(q_sqnorms[:, None] - 2.0 * dots + vec_sqnorms, 0.0)


def select_frontier(beam_ids, beam_d, expanded, M: int):
    """First M unexpanded pool entries (the pool is kept distance-sorted):
    returns (f_ids (B,M) — 0-filled past the live count, live (B,M) bool,
    new expanded mask). Uses a rank cumsum + one stable 2-operand sort
    instead of ``lax.top_k`` + position-compare matrix — measured 1.7 ms vs
    2.2 ms per hop at B=8192/ef=32 on v5e, and no take_along gathers."""
    B, ef = beam_ids.shape
    unexp = ~expanded
    r = jnp.cumsum(unexp.astype(jnp.int32), axis=1)
    pick = unexp & (r <= M)
    key = (~pick).astype(jnp.int32)
    _, ids_s = jax.lax.sort([key, beam_ids], dimension=1, num_keys=1,
                            is_stable=True)
    f_ids = ids_s[:, :M]
    npick = jnp.minimum(r[:, -1], M)
    live = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1) < npick[:, None]
    return jnp.where(live, f_ids, 0), live, expanded | pick


def merge_pool(beam_ids, beam_d, expanded, cand_ids, cand_d, cand_invalid,
               ef: int):
    """Pool ∪ candidates → best ``ef``, distance-sorted. One stable
    multi-operand sort carrying ids and expanded-flags — measured 2.2 ms vs
    9.5 ms for ``lax.top_k`` + three take_along gathers (B=8192, 160→32 on
    v5e); bit-identical output (ties break toward lower concat index in
    both)."""
    all_d = jnp.concatenate([beam_d, cand_d], axis=1)
    all_ids = jnp.concatenate([beam_ids, cand_ids], axis=1)
    all_exp = jnp.concatenate([expanded, cand_invalid], axis=1)
    d_s, i_s, e_s = jax.lax.sort(
        [all_d, all_ids, all_exp.astype(jnp.int32)], dimension=1, num_keys=1,
        is_stable=True)
    return i_s[:, :ef], d_s[:, :ef], e_s[:, :ef] > 0


def intra_dedup_mask(nbrs, MK: int):
    """Duplicates among the hop's own MK candidates (first occurrence kept):
    two stable sorts (by id, then back by position) instead of the
    O(MK²)-per-query compare matrix — the sorts scale n·log²n when M
    grows."""
    B = nbrs.shape[0]
    pos = jnp.broadcast_to(jnp.arange(MK, dtype=jnp.int32)[None], (B, MK))
    id_s, pos_s = jax.lax.sort([nbrs, pos], dimension=1, num_keys=1,
                               is_stable=True)
    dup_s = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                             (id_s[:, 1:] == id_s[:, :-1]).astype(jnp.int32)],
                            axis=1)
    _, dup = jax.lax.sort([pos_s, dup_s], dimension=1, num_keys=1,
                          is_stable=True)
    return dup > 0


def pack_neighbors(graph, base, dtype=None):
    """Inline each node's neighbor vectors next to its adjacency row:
    returns (packed_vecs (n, K, d), packed_sqnorms (n, K)).

    TPU gathers are row-rate-limited (~100M rows/s measured, regardless of
    row size), so gathering K separate d-dim neighbor vectors per expanded
    node costs K row-gathers, while one packed (K, d) row costs one. The
    packed layout trades K x memory for ~K x fewer gathers — the dominant
    walker cost (SURVEY §7.3; the same locality trick CAGRA-class GPU
    engines use). Pass the result to ``beam_search(packed_vecs=...,
    packed_sqnorms=...)``.
    """
    import numpy as np

    graph = np.asarray(graph)
    base_np = np.asarray(base)
    packed = base_np[graph]                       # (n, K, d)
    sq = (packed.astype(np.float32) ** 2).sum(-1)  # (n, K)
    if dtype is not None:
        packed = packed.astype(dtype)
    return packed, sq.astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("ef", "max_hops", "metric", "visited_mode", "precision",
                     "expand", "intra_dedup"),
)
def beam_search(queries, base, graph, entry_ids, *, ef: int,
                max_hops: int = 256, metric: str = "l2",
                visited_mode: str = "beam",
                base_sqnorms: jax.Array | None = None,
                precision: str = "highest",
                expand: int = 4, intra_dedup: bool = True,
                packed_vecs: jax.Array | None = None,
                packed_sqnorms: jax.Array | None = None) -> SearchResult:
    """Lockstep beam search of ``queries (B,d)`` over ``graph (n,K)`` with
    vectors ``base (n,d)`` (search space — typically the reduced-dim
    projection). ``entry_ids`` are the walk's start nodes, either shared
    ``(E,)`` or per-query ``(B, E)`` (e.g. from entries.CentroidEntries);
    E <= ef.

    Greedy search is the ``ef=1``-pool limit; the reference's recall knob is
    this same ``ef`` (SURVEY §4.3 "ef sweep").

    ``intra_dedup``: deduplicate candidates across the M expanded
    adjacency rows (O((M K)^2) compare, ~1/3 of hop cost at M=4, B=8192).
    Disabling lets duplicate pool entries waste slots for a small recall
    cost — a throughput knob for large sweeps.

    ``expand``: frontier nodes expanded per lockstep hop. The reference's
    scalar loop pops one candidate at a time; on TPU each hop is a fixed
    sequence of fused ops whose launch overhead dominates the tiny per-node
    math, so expanding the M best unexpanded pool entries per hop amortizes
    that overhead M-fold and shortens the sequential hop chain (the standard
    lockstep/multi-expand reformulation of best-first search). expand=1
    reproduces the reference's expansion order exactly.

    ``precision`` defaults to "highest": per-hop distance matvecs are tiny
    (B x K x d), so full-f32 MXU passes cost nothing measurable, while the
    TPU default (bf16 lowering) was measured to corrupt beam ordering enough
    to cap R@1 at ~0.84 on data whose true neighbor gaps are below bf16
    resolution of the ||q||^2-2qx+||x||^2 expansion.
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    if visited_mode not in ("beam", "exact"):
        raise ValueError(f"unknown visited_mode {visited_mode!r}")
    B, d = queries.shape
    n, K = graph.shape
    E = entry_ids.shape[-1]
    if E > ef:
        raise ValueError(f"entry count {E} > ef {ef}")
    M = max(1, min(expand, ef))

    qf = queries.astype(jnp.float32)
    q_sq = squared_norms(qf)
    x_sq = squared_norms(base) if base_sqnorms is None else base_sqnorms
    graph = graph.astype(jnp.int32)

    # ---- init: evaluate entry points, seed the pool -------------------
    # entry_ids (E,) = shared entries; (B, E) = per-query entries
    if entry_ids.ndim == 2:
        e_ids = entry_ids.astype(jnp.int32)                     # (B, E)
        entry_vecs = base[e_ids]
        entry_sq = x_sq[e_ids]
    else:
        e_ids = jnp.broadcast_to(entry_ids[None, :].astype(jnp.int32), (B, E))
        entry_vecs = jnp.broadcast_to(base[entry_ids], (B, E, d))
        entry_sq = jnp.broadcast_to(x_sq[entry_ids][None, :], (B, E))
    e_dists = _batched_dists(qf, entry_vecs, entry_sq, q_sq, metric,
                             precision=precision)  # (B,E)
    pad = ef - E
    beam_ids = jnp.pad(e_ids, ((0, 0), (0, pad)), constant_values=-1)
    beam_d = jnp.pad(e_dists, ((0, 0), (0, pad)), constant_values=jnp.inf)
    order = jnp.argsort(beam_d, axis=1)
    beam_ids = jnp.take_along_axis(beam_ids, order, axis=1)
    beam_d = jnp.take_along_axis(beam_d, order, axis=1)
    expanded = beam_ids < 0  # padding slots can never become the frontier

    if visited_mode == "exact":
        visited = jnp.zeros((B, n), dtype=jnp.bool_)
        rows = jnp.arange(B, dtype=jnp.int32)
        # max() not set(): -1 pool-padding slots clamp to index 0 and a
        # plain set(True) would permanently mark node 0 visited for every
        # query, silently excluding it from all results.
        visited = visited.at[rows[:, None], jnp.maximum(beam_ids, 0)].max(
            beam_ids >= 0)
    else:
        visited = jnp.zeros((B, 1), dtype=jnp.bool_)  # unused placeholder

    n_dist = jnp.full((B,), E, dtype=jnp.int32)
    state = (beam_ids, beam_d, expanded, visited, n_dist,
             jnp.int32(0), jnp.bool_(True))

    def cond(state):
        *_, hop, any_active = state
        return (hop < max_hops) & any_active

    rows_b = jnp.arange(B, dtype=jnp.int32)[:, None]

    def body(state):
        beam_ids, beam_d, expanded, visited, n_dist, hop, _ = state

        # -- frontier: first M unexpanded entries of the sorted pool ----
        # (the pool is kept distance-sorted by merge_pool, so these are the
        # M best; a pool member can never beat the current worst, making
        # the classic can-it-improve check vacuously true here)
        f_ids, live, expanded = select_frontier(beam_ids, beam_d, expanded, M)

        # -- evaluate the frontiers' adjacency rows ---------------------
        nbrs = jnp.take(graph, f_ids, axis=0).reshape(B, M * K)     # (B,MK)
        nbrs = jnp.where(jnp.repeat(live, K, axis=1), nbrs, -1)
        nbrs_safe = jnp.maximum(nbrs, 0)
        if packed_vecs is not None:
            # one (K, d) row-gather per expanded node instead of K row
            # gathers: see pack_neighbors
            nv = jnp.take(packed_vecs, f_ids, axis=0).reshape(B, M * K, d)
            nsq = jnp.take(packed_sqnorms, f_ids, axis=0).reshape(B, M * K)
        else:
            nv = jnp.take(base, nbrs_safe, axis=0)                  # (B,MK,d)
            nsq = jnp.take(x_sq, nbrs_safe, axis=0)
        dist = _batched_dists(qf, nv, nsq, q_sq, metric,
                              precision=precision)                  # (B,MK)

        dup = jnp.any(nbrs[:, :, None] == beam_ids[:, None, :], axis=-1)
        if M > 1 and intra_dedup:
            # intra-candidate dedup: the M adjacency rows can share nodes;
            # keep only the first occurrence in the flattened candidate list
            dup = dup | intra_dedup_mask(nbrs, M * K)
        if visited_mode == "exact":
            dup = dup | visited[rows_b, nbrs_safe]
            mark = (nbrs >= 0)
            visited = visited.at[rows_b, nbrs_safe].max(mark)

        invalid = (nbrs < 0) | dup
        cand_d = jnp.where(invalid, _INF, dist)
        n_dist = n_dist + jnp.sum(~invalid, axis=1).astype(jnp.int32)

        # -- merge pool ∪ candidates, keep best ef ----------------------
        beam_ids, beam_d, expanded = merge_pool(
            beam_ids, beam_d, expanded, nbrs, cand_d, invalid, ef)

        # -- continue? (walk ends when the whole pool is expanded) ------
        any_active = jnp.any(~expanded)
        return (beam_ids, beam_d, expanded, visited, n_dist,
                hop + 1, any_active)

    beam_ids, beam_d, expanded, visited, n_dist, hops, _ = \
        jax.lax.while_loop(cond, body, state)
    return SearchResult(ids=beam_ids, dists=beam_d, n_dist=n_dist, hops=hops)
