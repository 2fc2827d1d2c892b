"""Streaming brute-force k-nearest-neighbor: tiled distances + running top-k.

Capability parity: the reference's exact-kNN hot loop (SURVEY.md §4.1 — C++
OpenMP all-pairs sweep). TPU-first re-architecture: the base set is swept in
HBM-resident chunks; each chunk's distances are one MXU matmul, immediately
reduced to a per-chunk top-k, then merged into a running top-k carried through
a ``lax.scan``. Peak memory is O(nq * chunk), never O(nq * n), so a 1M-row
corpus streams through VMEM-friendly tiles while the matmul stays large
enough to saturate the MXU.

Exactness: ``exact=True`` uses ``lax.top_k`` (bit-exact GT path).
``exact=False`` uses ``lax.approx_max_k`` (TPU-native bucketed top-k,
~recall_target accuracy) — acceptable for graph construction, much faster
for large k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gbnns_tpu.kernels.distance import pairwise_dists, squared_norms

# NOTE: keep inf as a plain Python float. A module-level device-array
# constant (jnp.float32(inf)) captured into jit was measured to slow the
# compiled kernel ~400x (40ms vs 0.05ms per call) and intermittently wedge
# compilation on the axon TPU backend; inline scalar constants are free.
_INF = float("inf")


def _chunk_topk(neg_d: jax.Array, k: int, exact: bool, recall_target: float):
    if exact:
        return jax.lax.top_k(neg_d, k)
    return jax.lax.approx_max_k(neg_d, k, recall_target=recall_target)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "chunk", "exact", "recall_target",
                     "precision"),
)
def knn_chunked(q: jax.Array, x: jax.Array, k: int, *, metric: str = "l2",
                chunk: int = 65536, exact: bool = True,
                recall_target: float = 0.99,
                precision: str | None = None) -> tuple[jax.Array, jax.Array]:
    """Exact (or near-exact) kNN of ``q (nq,d)`` against ``x (n,d)``.

    Returns ``(dists (nq,k) float32, ids (nq,k) int32)`` sorted ascending by
    distance. Padding rows (when n % chunk != 0) are masked to +inf so they
    can never enter the result. ``exact=True`` defaults to full-f32 matmul
    precision on TPU (see ``pairwise_dists``); pass ``precision="default"``
    to trade exactness for ~6x MXU throughput.
    """
    if precision is None and exact:
        precision = "highest"
    nq, d = q.shape
    n = x.shape[0]
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    chunk = min(chunk, _round_up(n, 128))
    n_pad = _round_up(n, chunk)
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    x_chunks = xp.reshape(n_pad // chunk, chunk, d)
    xs = squared_norms(xp).reshape(n_pad // chunk, chunk)
    valid = (jnp.arange(n_pad, dtype=jnp.int32).reshape(n_pad // chunk, chunk) < n)

    def body(carry, inp):
        best_nd, best_i = carry  # negated dists (descending-best), ids
        xc, xsc, vc, idx0 = inp
        dists = pairwise_dists(q, xc, metric=metric, x_sqnorms=xsc,
                               precision=precision)
        neg = jnp.where(vc[None, :], -dists, -_INF)
        cd, ci = _chunk_topk(neg, min(k, chunk), exact, recall_target)
        ci = ci.astype(jnp.int32) + idx0
        if cd.shape[1] < k:  # chunk smaller than k: pad merge inputs
            pad = k - cd.shape[1]
            cd = jnp.pad(cd, ((0, 0), (0, pad)), constant_values=-_INF)
            ci = jnp.pad(ci, ((0, 0), (0, pad)), constant_values=-1)
        md, sel = jax.lax.top_k(jnp.concatenate([best_nd, cd], axis=1), k)
        mi = jnp.take_along_axis(jnp.concatenate([best_i, ci], axis=1), sel, axis=1)
        return (md, mi), None

    init = (jnp.full((nq, k), -_INF), jnp.full((nq, k), -1, dtype=jnp.int32))
    idx0s = jnp.arange(0, n_pad, chunk, dtype=jnp.int32)
    (best_nd, best_i), _ = jax.lax.scan(body, init, (x_chunks, xs, valid, idx0s))
    return -best_nd, best_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "chunk", "q_chunk", "exact",
                     "recall_target", "precision"),
)
def knn_fused(q: jax.Array, x: jax.Array, k: int, *, metric: str = "l2",
              chunk: int = 65536, q_chunk: int = 8192,
              exact: bool = True, recall_target: float = 0.99,
              precision: str | None = None) -> tuple[jax.Array, jax.Array]:
    """kNN of a (possibly large) query block against ``x`` as ONE device
    program: an outer ``lax.scan`` over query chunks wrapping the inner
    corpus sweep. One compile + one execution + one transfer per call.

    This environment's device relay is fragile in two specific ways
    (SURVEY §8.1): it wedges when >~100 multi-second executions queue up in
    one process, and the TPU worker crashes outright on single executions
    longer than ~60-90 s. Large sweeps must therefore be issued as a FEW
    MEDIUM executions — this function is the building block; callers split
    the query axis so each call stays within the execution-time budget
    (see build_knn_graph).
    """
    if precision is None and exact:
        precision = "highest"
    nq, d = q.shape
    nq_pad = _round_up(nq, q_chunk)
    qp = jnp.pad(q, ((0, nq_pad - nq), (0, 0)))
    q_chunks = qp.reshape(nq_pad // q_chunk, q_chunk, d)

    def one_chunk(_, qc):
        dd, ii = knn_chunked(qc, x, k, metric=metric, chunk=chunk,
                             exact=exact, recall_target=recall_target,
                             precision=precision)
        return None, (dd, ii)

    _, (dists, ids) = jax.lax.scan(one_chunk, None, q_chunks)
    return (dists.reshape(nq_pad, k)[:nq], ids.reshape(nq_pad, k)[:nq])


def knn(q, x, k: int, *, metric: str = "l2", chunk: int = 65536,
        q_chunk: int | None = None, exact: bool = True,
        recall_target: float = 0.99, precision: str | None = None):
    """Host-level wrapper: additionally tiles the query axis (``q_chunk``)
    so arbitrarily large query sets stream through fixed device memory.
    Accepts numpy or jax arrays; returns jax arrays.
    """
    q = jnp.asarray(q)
    x = jnp.asarray(x)
    nq = q.shape[0]
    if q_chunk is None or q_chunk >= nq:
        return knn_chunked(q, x, k, metric=metric, chunk=chunk, exact=exact,
                           recall_target=recall_target, precision=precision)
    outs_d, outs_i = [], []
    for off in range(0, nq, q_chunk):
        dd, ii = knn_chunked(q[off:off + q_chunk], x, k, metric=metric,
                             chunk=chunk, exact=exact,
                             recall_target=recall_target, precision=precision)
        outs_d.append(dd)
        outs_i.append(ii)
    return jnp.concatenate(outs_d, axis=0), jnp.concatenate(outs_i, axis=0)


def _round_up(a: int, m: int) -> int:
    return -(-a // m) * m
