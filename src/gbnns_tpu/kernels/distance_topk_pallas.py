"""Fused Pallas kernel: tiled MXU distances + in-VMEM streaming top-k.

Capability: the reference's brute-force kNN hot loop (SURVEY.md §4.1) as one
TPU kernel — the "tiled Pallas MXU distance kernel + top-k" of SURVEY §3.
The XLA path (``kernels.topk.knn_chunked``) materializes each (nq, chunk)
distance tile to HBM and sorts it with ``lax.top_k``; this kernel keeps the
distance tile in VMEM, maintains the running per-query top-k in VMEM scratch
across the corpus sweep, and — the key trick — **threshold-prunes** the
selection: a tile whose minimum distance is no better than the current k-th
best for every query in the block is discarded right after the matmul, so in
steady state almost every grid step is matmul-only and the selection loop
(3 VPU reductions per extracted candidate) runs on a vanishing fraction of
tiles.

Grid: (q_blocks, x_tiles), x fastest — scratch (running top-k) persists
across the x sweep of one q block and resets when the q block changes.


STATUS (round 4): DEMOTED to a documented negative — the
``build_knn_graph(backend="pallas")`` config surface is removed. The
full A/B at n=250k (`results/build_backend_ab.json`) measured it 6.4x
slower than the XLA approx path at k=32 and 8.6x slower than the XLA
*exact* path at k=128, with selection results exact (overlap 1.0000) at
both: the O(k) serial min-extract rounds per contributing tile grow with
exactly the large-k axis that was this kernel's claimed niche (round-2
hypothesis, SURVEY §8.2.4), so there is no k where it wins. The kernel
stays importable (and oracle-tested in tests/test_pallas_kernels.py) as
the reference VMEM-resident exact fused sweep; packed-key selection
(merge_topc's trick) was considered and rejected — it quantizes the
selection boundary, which an EXACT sweep cannot absorb (no re-rank
downstream of a graph build).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_F = float(np.finfo(np.float32).max)
_BIG_I = np.iinfo(np.int32).max


def _knn_kernel(q_ref, x_ref, xsq_ref, out_d_ref, out_i_ref,
                best_d, best_i, work_d, work_i, qsq, *, k: int, xt: int,
                n_total: int, metric: str):
    j = pl.program_id(1)
    nx = pl.num_programs(1)

    # ---- per-q-block init (first x tile) ------------------------------
    @pl.when(j == 0)
    def _():
        best_d[:, :] = jnp.full_like(best_d[:, :], _BIG_F)
        best_i[:, :] = jnp.full_like(best_i[:, :], -1)
        qf = q_ref[:, :].astype(jnp.float32)
        qsq[:, :] = jnp.sum(qf * qf, axis=1, keepdims=True)

    # ---- distances for this tile: one MXU matmul ----------------------
    # HIGHEST (3-pass f32) only applies to f32 inputs; Mosaic rejects it for
    # bf16 operands ("Bad lhs type"), where single-pass is already native.
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    dots = jax.lax.dot_general(
        q_ref[:, :], x_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )                                                       # (QT, XT)
    if metric == "l2":
        dist = qsq[:, :] - 2.0 * dots + xsq_ref[:, :]
    else:  # ip / angular
        dist = -dots
    # mask padding columns (x tile may run past n_total)
    col = j * xt + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist = jnp.where(col < n_total, dist, _BIG_F)

    # ---- threshold prune: skip selection unless tile can contribute ----
    tile_min = jnp.min(dist)
    thresh = jnp.max(best_d[:, :])

    @pl.when(tile_min < thresh)
    def _():
        qt = dist.shape[0]
        w = k + xt
        work_d[:, :k] = best_d[:, :]
        work_i[:, :k] = best_i[:, :]
        work_d[:, k:] = dist
        work_i[:, k:] = col
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (qt, w), 1)
        for slot in range(k):
            m = jnp.min(work_d[:, :], axis=1)               # (QT,)
            ismin = work_d[:, :] == m[:, None]
            first = jnp.min(jnp.where(ismin, iota_w, _BIG_I), axis=1)
            at_first = iota_w == first[:, None]
            sel_id = jnp.min(jnp.where(at_first, work_i[:, :], _BIG_I), axis=1)
            best_d[:, slot] = m
            best_i[:, slot] = sel_id.astype(jnp.int32)
            work_d[:, :] = jnp.where(at_first, _BIG_F, work_d[:, :])

    # ---- final x tile: publish the running top-k ----------------------
    @pl.when(j == nx - 1)
    def _():
        out_d_ref[:, :] = best_d[:, :]
        out_i_ref[:, :] = best_i[:, :]


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "qt", "xt", "interpret",
                                    "n_valid"))
def knn_pallas(q: jax.Array, x: jax.Array, k: int, *, metric: str = "l2",
               qt: int = 256, xt: int = 1024, interpret: bool = False,
               n_valid: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Exact kNN via the fused kernel. Returns (dists (nq,k) f32 ascending,
    ids (nq,k) int32). Inputs f32 (or bf16; accumulation is f32).

    ``n_valid``: logical corpus size when ``x`` is already padded to an
    ``xt`` multiple (lets a caller hoist the pad out of a chunked sweep).

    Selection cost note: extraction is 3 VPU reductions per (slot, tile), so
    k is best kept <= 128; the threshold prune keeps the amortized cost near
    the pure-matmul bound.
    """
    if metric not in ("l2", "ip", "angular"):
        raise ValueError(f"unknown metric {metric!r}")
    nq, d = q.shape
    n = x.shape[0] if n_valid is None else n_valid
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    # pad shapes to tile multiples; pad amount derives from the PHYSICAL
    # row count so pre-padded callers (n_valid set) don't get re-padded
    nq_p = -(-nq // qt) * qt
    n_p = -(-x.shape[0] // xt) * xt
    qp = jnp.pad(q, ((0, nq_p - nq), (0, 0)))
    xp = jnp.pad(x, ((0, n_p - x.shape[0]), (0, 0)))
    xsq = jnp.sum(xp.astype(jnp.float32) * xp, axis=1)[None, :]  # (1, n_p)

    grid = (nq_p // qt, n_p // xt)
    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, xt=xt, n_total=n, metric=metric),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xt, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_p, k), jnp.float32),
            jax.ShapeDtypeStruct((nq_p, k), jnp.int32),
        ],
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((qt, k), jnp.float32),      # best_d
            pltpu.VMEM((qt, k), jnp.int32),        # best_i
            pltpu.VMEM((qt, k + xt), jnp.float32),  # work_d
            pltpu.VMEM((qt, k + xt), jnp.int32),    # work_i
            pltpu.VMEM((qt, 1), jnp.float32),       # q squared norms
        ],
    )(qp, xp, xsq)
    return out_d[:nq], out_i[:nq]
