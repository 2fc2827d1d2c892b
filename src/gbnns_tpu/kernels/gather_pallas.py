"""Pallas per-row DMA gather — random row fetch at DMA-engine speed.

The graph walker's hot op is gathering each expanded node's neighbor data
from HBM by a runtime index (SURVEY §4.3 hot loop; the reference's C++
walker does this as scalar pointer chasing, reference semantics per
SURVEY §3 "Greedy/beam searcher"). XLA lowers ``jnp.take`` of large random
rows to a gather that is *byte-rate-bound at ~4.2 GB/s on v5e* (measured
round 2: 39.9 ms for 32k x 128 f32 rows unpacked, 30.6 ms for 32k packed
4 KB rows — only 1.3x better despite 1024x fewer rows). A Pallas kernel
that issues one async DMA per row with a deep outstanding-copy pipeline
moves the same 32k x 4 KB rows in 2.6 ms — **51 GB/s, ~12x faster than
XLA's gather** — because the DMA engines pipeline independent 4 KB
HBM→HBM copies while XLA's gather serializes on element addressing.

The round-1 design note (SURVEY §8.2.1) measured per-row DMAs at 128-byte
rows, where the ~0.2 us issue cost dominates, and concluded Pallas cannot
beat XLA's gather. That conclusion inverts at 4 KB rows: issue cost
amortizes 32x, and this kernel retires it (VERDICT.md "What's missing" #2
asked for exactly this A/B).

Constraints: rows must be tile-aligned — shape (n, S, 128) with S a
multiple of 8 (f32 sublane tiling); indices must be int32. The copy is
HBM→HBM: no VMEM bounce, so row size is bounded by HBM, not VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Outstanding-DMA pipeline depth. Measured on v5e at 32k x 4KB random rows:
# S=16 → 44.8 GB/s, S=32 → 51.4 GB/s; deeper shows no further gain.
_SLOTS = 32


def _gather_kernel(idx_ref, src_ref, out_ref, sems, *, rows: int, slots: int):
    """One grid cell: DMA ``rows`` random source rows to the output, keeping
    ``slots`` copies in flight. Source/destination both stay in HBM."""

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            src_ref.at[idx_ref[i]], out_ref.at[i], sems.at[slot])

    def warm(s, carry):
        get_dma(s, s).start()
        return carry

    jax.lax.fori_loop(0, min(slots, rows), warm, None)

    def body(i, carry):
        slot = jax.lax.rem(i, slots)
        get_dma(slot, i).wait()
        nxt = i + slots

        @pl.when(nxt < rows)
        def _():
            get_dma(slot, nxt).start()

        return carry

    jax.lax.fori_loop(0, rows, body, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dma_row_gather(payload: jax.Array, idx: jax.Array, *,
                   interpret: bool = False) -> jax.Array:
    """Gather ``payload[idx]``: (n, S, 128) f32 x (R,) int32 → (R, S, 128).

    Drop-in replacement for ``jnp.take(payload, idx, axis=0)`` on rows of
    >= 4 KB; ~12x faster on v5e (see module docstring). ``interpret=True``
    runs the Mosaic interpreter so CPU tests exercise the same code path.
    """
    n, s, lanes = payload.shape
    if lanes != 128 or s % 8:
        raise ValueError(f"payload rows must be (8k, 128)-tiled, got ({s}, {lanes})")
    if payload.dtype != jnp.float32:
        raise ValueError("payload must be float32-viewed (bitcast packing)")
    rows = idx.shape[0]
    return pl.pallas_call(
        functools.partial(_gather_kernel, rows=rows,
                          slots=min(_SLOTS, rows)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((min(_SLOTS, rows),))],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, s, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx.astype(jnp.int32), payload)
