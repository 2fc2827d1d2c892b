"""Exact kNN-graph construction.

Capability parity: the reference's graph-build entry point (SURVEY.md §4.1):
all-pairs distances over the base set, top-(K+1) per node, self edge dropped,
written as an (n, K) int32 adjacency artifact. TPU-first: the O(n²·d) sweep
runs as tiled MXU matmuls via ``kernels.topk.knn`` — base rows are both the
query tile (streamed in ``node_chunk`` blocks) and the corpus (streamed in
``chunk`` blocks), so device memory stays bounded while each step is a large
matmul. This is the "kNN-graph build time" headline metric (BASELINE.json:2).
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

import functools

import jax
import jax.numpy as jnp

from gbnns_tpu.kernels.distance import pairwise_dists
from gbnns_tpu.kernels.topk import knn_chunked


def build_knn_graph(base, K: int, *, metric: str = "l2",
                    node_chunk: int = 8192, chunk: int = 65536,
                    exact: bool = True, recall_target: float = 0.99,
                    dtype=None, precision: str | None = None,
                    connect: bool = True,
                    verbose: bool = False) -> np.ndarray:
    """Build the exact (or near-exact) kNN graph: (n, K) int32 neighbor ids.

    Self-edges are excluded by taking top-(K+1) and dropping each node's own
    id (which is at distance 0 and therefore always retrieved by an exact
    sweep; under ``exact=False`` the self id is filtered wherever it lands).

    ``dtype`` optionally casts the distance-matmul inputs (e.g. bfloat16 for
    ~2x MXU throughput on the build; accumulation stays f32).
    """
    base = np.asarray(base)
    n, d = base.shape
    if K >= n:
        raise ValueError(f"K={K} >= n={n}")
    xb = jnp.asarray(base if dtype is None else base.astype(dtype))
    graph = np.empty((n, K), dtype=np.int32)
    t0 = time.perf_counter()
    for off in range(0, n, node_chunk):
        hi = min(off + node_chunk, n)
        _, ids = knn_chunked(xb[off:hi], xb, K + 1, metric=metric,
                             chunk=chunk, exact=exact,
                             recall_target=recall_target, precision=precision)
        ids = np.asarray(ids)
        graph[off:hi] = _drop_self(ids, off)
        if verbose:
            done = hi / n
            dt = time.perf_counter() - t0
            print(f"  knn-graph {hi}/{n} ({done:.0%}) {dt:.1f}s", flush=True)
    if connect:
        graph = ensure_connected(base, graph, metric=metric, verbose=verbose)
    return graph


def _drop_self(ids: np.ndarray, row_offset: int) -> np.ndarray:
    """From (m, K+1) candidate ids, remove each row's own id; keep K.

    If the self id is absent (possible only with exact=False), drop the last
    (worst) candidate instead, preserving order.
    """
    m, kp1 = ids.shape
    self_ids = (np.arange(m) + row_offset)[:, None]
    is_self = ids == self_ids
    # Position to drop: the self id where found, else the final column.
    drop = np.where(is_self.any(axis=1), is_self.argmax(axis=1), kp1 - 1)
    keep = np.arange(kp1)[None, :] != drop[:, None]
    return ids[keep].reshape(m, kp1 - 1)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def _propagate_labels(graph: jax.Array, max_iters: int = 128) -> jax.Array:
    """Weakly-connected-component labels of the directed graph (n, K), fully
    on device: iterative min-label propagation along forward edges (gather)
    and reverse edges (scatter-min), until fixpoint. O(diameter) sweeps, each
    one a big vectorized gather/scatter — the TPU-native replacement for a
    host-side union-find."""
    n = graph.shape[0]
    init = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        fwd = jnp.min(jnp.take(labels, graph, axis=0), axis=1)
        new = jnp.minimum(labels, fwd)
        new = new.at[graph].min(labels[:, None])
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return labels


def connected_components(graph) -> np.ndarray:
    """Component label per node (weak connectivity), as int32 (n,)."""
    return np.asarray(_propagate_labels(jnp.asarray(graph, dtype=jnp.int32)))


def forward_reachable(graph, entry_ids) -> np.ndarray:
    """Boolean mask: directed-reachable from ``entry_ids`` (the walker's
    reachability guarantee checked by ``ensure_connected``)."""
    return np.asarray(_forward_reachable(
        jnp.asarray(graph, dtype=jnp.int32),
        jnp.asarray(entry_ids, dtype=jnp.int32)))


@functools.partial(jax.jit, static_argnames=("max_iters",))
def _forward_reachable(graph: jax.Array, seeds: jax.Array,
                       max_iters: int = 512) -> jax.Array:
    """Boolean mask of nodes reachable from ``seeds`` along *directed*
    edges, by on-device frontier propagation (scatter-or per sweep)."""
    n = graph.shape[0]
    init = jnp.zeros((n,), jnp.bool_).at[seeds].set(True)

    def cond(state):
        reached, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        reached, _, it = state
        new = reached.at[graph].max(reached[:, None])
        return new, jnp.any(new != reached), it + 1

    reached, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return reached


def ensure_connected(base, graph: np.ndarray, *, metric: str = "l2",
                     entry_ids: np.ndarray | None = None,
                     max_rounds: int = 64, verbose: bool = False) -> np.ndarray:
    """Make every node *directed-reachable from the walker's entry points*
    by splicing bridge edges in place of worst kNN edges.

    An exact kNN graph on clustered data fragments into one component per
    cluster, which caps the recall any graph walker can reach (measured:
    4.9%-reachable graph → R@1 plateau ~0.84 on the synthetic SIFT
    stand-in). Weak connectivity is not enough — the walker follows edges
    forward, so the guarantee must be directed reachability from the entry
    set (measured: weak-only bridging still left a 0.90 recall plateau on
    256-node shards). The reference sidesteps all this because SIFT/GIST kNN
    graphs are naturally near-connected; a general engine must not rely on
    that.

    Each round, on device: forward-reachability fixpoint from the entries;
    weak-component labels restricted to the unreached set; then for one
    representative per unreached component, the exact nearest *reached* node
    (one batched MXU distance sweep) donates its worst adjacency slot to a
    bridge edge into the component (plus the reverse edge for navigability).
    Index memory is unchanged — degree stays K.
    """
    from gbnns_tpu.search.walker_jax import default_entry_ids

    graph = np.array(graph, dtype=np.int32, copy=True)
    n, K = graph.shape
    base_j = jnp.asarray(base)
    if entry_ids is None:
        entry_ids = np.asarray(default_entry_ids(n))
    entries_j = jnp.asarray(entry_ids, dtype=jnp.int32)

    # A node's last slot is sacrificed at most once, ever: re-donating it in
    # a later round would sever the earlier bridge and oscillate.
    used: set[int] = set()
    for _ in range(max_rounds):
        reached = np.asarray(_forward_reachable(jnp.asarray(graph), entries_j))
        if reached.all():
            break
        # Weak components among unreached nodes only: mask out any edge that
        # touches a reached node (replace with a self-loop) so labels cannot
        # leak across the reached boundary.
        self_col = np.arange(n, dtype=np.int32)[:, None]
        masked = np.where(reached[graph] | reached[:, None], self_col, graph)
        labels = np.asarray(_propagate_labels(jnp.asarray(masked)))
        # one representative per unreached component
        seen: dict[int, int] = {}
        reps = []
        for node in np.flatnonzero(~reached):
            lab = labels[node]
            if lab not in seen:
                seen[lab] = node
                reps.append(node)
        reps = np.asarray(reps, dtype=np.int64)
        if verbose:
            print(f"  ensure_connected: {len(reps)} unreached components "
                  f"({(~reached).sum()} nodes)", flush=True)
        d = np.array(pairwise_dists(base_j[reps], base_j, metric=metric,
                                    precision="highest"))
        d[:, ~reached] = np.inf  # bridge source must already be reachable
        if used:
            d[:, np.fromiter(used, dtype=np.int64)] = np.inf
        sources = d.argmin(axis=1).astype(np.int32)
        # Collisions (two reps picking the same source this round) would
        # overwrite the same slot; keep the first, defer the rest.
        for i, (rep, src) in enumerate(zip(reps, sources)):
            if int(src) in used or not np.isfinite(d[i, src]):
                continue
            used.add(int(src))
            used.add(int(rep))  # rep's last slot now holds the reverse bridge
            graph[src, K - 1] = rep
            graph[rep, K - 1] = src
    return graph


def save_graph(path: str, graph: np.ndarray) -> None:
    """Persist the adjacency artifact (staged-pipeline boundary, SURVEY §5.4)."""
    np.save(path, np.ascontiguousarray(graph, dtype=np.int32))


def load_graph(path: str) -> np.ndarray:
    g = np.load(path, mmap_mode="r")
    if g.ndim != 2 or g.dtype != np.int32:
        raise ValueError(f"{path}: expected (n, K) int32 adjacency, got {g.shape} {g.dtype}")
    return g
