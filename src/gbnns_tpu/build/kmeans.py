"""Device k-means: the coarse quantizer for the IVF-pruned scan engine.

Capability context: the reference (SURVEY.md §3) has no pruned index — its
brute-force scan and graph walk are the only engines. At 1M–10M rows the
TPU-native flat scan (search/flat.py) becomes HBM-bound on the score matrix
(every query scores every row), so the rebuild adds the classical IVF
structure re-architected for TPU: a k-means coarse quantizer fitted on the
MXU, base vectors laid out in contiguous per-cluster blocks, and a
query-tiled pruned scan (search/ivf.py).

TPU-first choices:
  * Lloyd updates avoid scatter-adds entirely (TPU scatters with duplicate
    indices serialize per element, SURVEY §8.1): centroid sums are a
    one-hot (chunk, ncent)^T @ (chunk, d) MXU matmul accumulated through a
    ``lax.scan`` over row chunks.
  * The whole fit is ONE jit'd program (fixed iteration count via scan) —
    no per-iteration host round-trips through the axon relay.
  * Assignment distances run at default (bf16) matmul precision: cluster
    membership is tolerant of bf16 score error, and the pruned scan's
    recall is governed by multi-block probing, not assignment exactness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gbnns_tpu.kernels.distance import pairwise_dists, squared_norms


def _round_up(a: int, m: int) -> int:
    return -(-a // m) * m


@functools.partial(jax.jit, static_argnames=("iters", "chunk"))
def _lloyd(x_chunks, valid, cents0, *, iters: int, chunk: int):
    """``iters`` Lloyd iterations over row chunks, one compiled program.

    x_chunks: (nc, chunk, d) f32; valid: (nc, chunk) bool (padding mask);
    cents0: (ncent, d) f32. Returns updated centroids (ncent, d) f32.
    """
    ncent, d = cents0.shape

    def one_iter(cents, _):
        c_sq = squared_norms(cents)

        def body(carry, inp):
            sums, counts = carry
            xc, vc = inp
            dist = pairwise_dists(xc, cents, metric="l2", x_sqnorms=c_sq,
                                  precision="default")       # (chunk, ncent)
            assign = jnp.argmin(dist, axis=1)
            onehot = (assign[:, None] ==
                      jnp.arange(ncent, dtype=jnp.int32)[None, :])
            onehot = jnp.where(vc[:, None], onehot, False)
            oh = onehot.astype(jnp.bfloat16)
            # centroid partial sums as an MXU contraction — never a scatter
            sums = sums + jax.lax.dot_general(
                oh, xc.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(onehot, axis=0).astype(jnp.float32)
            return (sums, counts), None

        init = (jnp.zeros((ncent, d), jnp.float32),
                jnp.zeros((ncent,), jnp.float32))
        (sums, counts), _ = jax.lax.scan(body, init, (x_chunks, valid))
        # empty clusters keep their previous centroid (re-seeding would need
        # data-dependent control flow; empties simply attract no probes)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None],
                        cents)
        return new, None

    cents, _ = jax.lax.scan(one_iter, cents0, None, length=iters)
    return cents


def kmeans_fit(x, ncent: int, *, iters: int = 10, seed: int = 0,
               sample: int | None = 262_144, chunk: int = 16_384) -> np.ndarray:
    """Fit ``ncent`` centroids to ``x (n, d)``. Returns (ncent, d) float32.

    ``sample`` caps the number of rows used for fitting (random subset —
    plenty for a coarse quantizer); the final assignment over the full
    corpus happens separately in :func:`kmeans_assign`.
    """
    x = np.asarray(x, np.float32)
    n, d = x.shape
    if ncent > n:
        raise ValueError(f"ncent={ncent} > n={n}")
    rng = np.random.default_rng(seed)
    if sample is not None and sample < n:
        fit_rows = x[rng.choice(n, size=sample, replace=False)]
    else:
        fit_rows = x
    cents0 = fit_rows[rng.choice(fit_rows.shape[0], size=ncent, replace=False)]

    m = fit_rows.shape[0]
    chunk = min(chunk, _round_up(m, 128))
    m_pad = _round_up(m, chunk)
    xp = np.zeros((m_pad, d), np.float32)
    xp[:m] = fit_rows
    nc = m_pad // chunk
    valid = (np.arange(m_pad).reshape(nc, chunk) < m)
    cents = _lloyd(jnp.asarray(xp.reshape(nc, chunk, d)), jnp.asarray(valid),
                   jnp.asarray(cents0), iters=iters, chunk=chunk)
    return np.asarray(cents)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_chunks(x_chunks, cents, *, chunk: int):
    c_sq = squared_norms(cents)

    def body(_, xc):
        dist = pairwise_dists(xc, cents, metric="l2", x_sqnorms=c_sq,
                              precision="default")
        return None, jnp.argmin(dist, axis=1).astype(jnp.int32)

    _, assign = jax.lax.scan(body, None, x_chunks)
    return assign


def kmeans_assign(x, centroids, *, chunk: int = 65_536) -> np.ndarray:
    """Nearest-centroid id per row of ``x``: (n,) int32."""
    x = np.asarray(x, np.float32)
    n, d = x.shape
    chunk = min(chunk, _round_up(n, 128))
    n_pad = _round_up(n, chunk)
    xp = np.zeros((n_pad, d), np.float32)
    xp[:n] = x
    out = _assign_chunks(jnp.asarray(xp.reshape(n_pad // chunk, chunk, d)),
                         jnp.asarray(np.asarray(centroids, np.float32)),
                         chunk=chunk)
    return np.asarray(out).reshape(n_pad)[:n]
