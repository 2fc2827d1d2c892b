"""Fused Pallas scan: distances + binned candidate selection in VMEM.

The flat engine's bottleneck at 1M+ rows is NOT compute — the score matmul
is ~1 TFLOP at n=1M, B=16k — it is HBM traffic: XLA materializes the
(B, n) f32 score matrix (65 GB at 1M/16k) to feed ``approx_max_k``
(measured: the whole flat scan runs at HBM speed, SURVEY §8.2.1). This
kernel fuses selection into the matmul so scores live and die in VMEM:

  grid (n_chunks, b_tiles); each cell loads one corpus chunk (CN, d) and
  one query tile (TQ, d), then loops over ``CN/BIN`` column bins:
  one MXU contraction (TQ, BIN) per bin, immediately reduced to that bin's
  min score + argmin column (VPU). Only (B, n/BIN) bin-winners ever reach
  HBM — 500x less traffic than the score matrix at BIN=1024.

Selection is approximate in exactly the way ``lax.approx_max_k`` is (its
documented algorithm is this same bin-and-argmax PartialReduce): each bin
yields one winner, so two true top-k ids colliding in one bin lose the
worse one. With n/BIN bins the expected loss for top-10 is
~45/(n/BIN) per query (<5% single-candidate loss at 1M/BIN=1024), and the
full-dim re-rank stage absorbs it exactly like it absorbs projection
error. The binned winners are merged to final top-k candidates by one
tiny XLA top-k over (B, n/BIN).

L2 uses the ``‖x‖² − 2 q·x`` expansion (the per-query ‖q‖² term cannot
change a per-query ranking); ip/angular use ``−q·x``. Padding columns
carry +inf in ``addvec`` so they never win a bin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(a: int, m: int) -> int:
    return -(-a // m) * m


def _scan_kernel(q_ref, x_ref, add_ref, qs_ref, val_ref, idx_ref, *,
                 n_bins_c: int, bin_size: int, l2: bool, packed: bool,
                 prescaled: bool, shifted: bool, quant: bool = False):
    """One (corpus-chunk, query-tile) cell: bin-reduced scores.

    Scores are computed transposed — (BIN, TQ), corpus rows on sublanes —
    so the per-bin min/argmin is a sublane reduction and the outputs land
    as (n_bins_c, TQ) row writes, whose block shape satisfies the TPU
    (8, 128) tiling constraint (a (TQ, n_bins_c) layout would not).

    ``packed=True`` replaces the min+argmin pair (2-3 VPU passes over every
    score — the kernel's dominant cost, the matmul is ~3x cheaper) with ONE
    integer min pass: the f32 score is mapped to its order-preserving int32
    key (sign-magnitude -> two's-complement flip: the classic IEEE total-
    order trick) and the low ``log2(bin_size)`` mantissa bits are replaced
    by the in-bin row index. Integer min then yields winner AND position
    together; the score the caller gets back is quantized by 2^-13 relative
    (ties break toward lower index), which the final top-c merge and exact
    full-dim re-rank absorb.

    q_ref (TQ, d); x_ref (CN, d); add_ref (1, CN); outputs (n_bins_c, TQ).
    """
    j = pl.program_id(0)
    q = q_ref[:]
    cn = x_ref.shape[0]
    base_col = j * cn
    idx_bits = int(np.log2(bin_size))
    mask = (1 << idx_bits) - 1

    for b in range(n_bins_c):
        xb = x_ref[b * bin_size:(b + 1) * bin_size, :]
        dots = jax.lax.dot_general(
            xb, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if quant
            else jnp.float32)                            # (BIN, TQ)
        addb = add_ref[0, b * bin_size:(b + 1) * bin_size]
        if quant:
            # int8 x int8 -> int32 MXU contraction; qs_ref carries the
            # PER-QUERY dequantization factor alpha = -2/(sx*sq) (l2) or
            # -1/(sx*sq) (ip). A per-query positive scale on the dot term
            # cannot change that query's ranking, so per-query quantization
            # is exact for selection; the absolute error (int8 rounding of
            # x and q) is absorbed by the full-dim re-rank exactly like the
            # bf16 path's rounding.
            scores = addb[:, None] + (dots.astype(jnp.float32)
                                      * qs_ref[0, :][None, :])
        elif prescaled:
            # corpus stored as -2x (l2) / -x (ip): the scale rides in the
            # matmul (an exact bf16 exponent shift), saving one VPU pass
            # over every score — the selection epilogue is this kernel's
            # cost ceiling (SURVEY §9)
            scores = addb[:, None] + dots
        elif l2:
            scores = addb[:, None] - 2.0 * dots
        else:
            scores = addb[:, None] - dots
        if shifted:
            # per-query shift (‖q‖² for l2 / an upper bound for ip) makes
            # scores >= ~0 so IEEE bits compare correctly as signed ints
            # WITHOUT the 3-op sign flip: one broadcast add replaces
            # cmp+xor+select. MEASURED NEUTRAL at 1M (409.6k vs 417.1k QPS,
            # within session noise): Mosaic already fuses the flip into the
            # min pass, so the op-count model overestimates its cost. Kept
            # as an option; the default path stays unshifted.
            scores = scores + qs_ref[0, :][None, :]
        if packed:
            bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
            if shifted:
                okey = bits
            else:
                # signed-int total order for IEEE floats: negatives flip
                # their low 31 bits (reverses order, keeps below positives)
                okey = jnp.where(bits < 0, bits ^ 0x7FFFFFFF, bits)
            iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
            pkey = (okey & ~mask) | iota
            pmin = jnp.min(pkey, axis=0)                 # ONE pass
            pos = pmin & mask
            obits = pmin & ~mask
            if shifted:
                vbits = obits
            else:
                vbits = jnp.where(obits < 0, obits ^ 0x7FFFFFFF, obits)
            val_ref[b, :] = jax.lax.bitcast_convert_type(vbits, jnp.float32)
        else:
            pos = jnp.argmin(scores, axis=0).astype(jnp.int32)
            val_ref[b, :] = jnp.min(scores, axis=0)
        idx_ref[b, :] = pos + (base_col + b * bin_size)


def _scan_kernel_shifted(q_ref, x_ref, val_ref, idx_ref, *, n_bins_c: int,
                         bin_size: int):
    """Shifted-key cell: the WHOLE score comes out of the MXU.

    The corpus is pre-augmented (see ``augment_corpus``) so that one
    contraction yields ``‖x‖² − 2 q·x + ‖q‖²  >= ~0``: non-negative IEEE
    floats compare correctly as signed int32, so the sign-flip of the
    packed mode disappears and the per-score epilogue shrinks from ~7 VPU
    ops to 3 (and, or, min). Norms ride in as bf16 hi+lo pairs (~2^-17
    relative), so the residual negative scores are at the 2^-16 scale —
    only exact-duplicate rows can invert, which the re-rank absorbs.

    MEASURED OUTCOME (v5e, n=1M, B=16k, interleaved A/B): binned/packed
    ~305k QPS vs shifted ~240k — the epilogue op-count model was wrong;
    the kernel is bound by the matmul/load pipeline, and widening the
    corpus row from 32 to 36 non-tile-aligned lanes costs more than the
    VPU savings. Kept as a documented negative result; ``mode="binned"``
    stays the default (SURVEY §8 round-2 addendum).
    """
    j = pl.program_id(0)
    q = q_ref[:]
    cn = x_ref.shape[0]
    base_col = j * cn
    idx_bits = int(np.log2(bin_size))
    mask = (1 << idx_bits) - 1

    for b in range(n_bins_c):
        xb = x_ref[b * bin_size:(b + 1) * bin_size, :]
        scores = jax.lax.dot_general(
            xb, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BIN, TQ)
        bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        pkey = (bits & ~mask) | iota
        pmin = jnp.min(pkey, axis=0)
        val_ref[b, :] = jax.lax.bitcast_convert_type(pmin & ~mask,
                                                     jnp.float32)
        idx_ref[b, :] = (pmin & mask) + (base_col + b * bin_size)


def _split_hi_lo(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """f32 vector → bf16-representable (hi, lo) with hi+lo ≈ v to ~2^-17."""
    import ml_dtypes

    hi = v.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = (v - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
    return hi, lo


def augment_corpus(x_lo_pad: np.ndarray, n: int, metric: str) -> np.ndarray:
    """Fold the full distance into one matmul: returns x_aug (n_pad, d+4
    for l2, d+1 for ip/angular) f32 (cast to the scan dtype by the caller).

      l2:  x_aug = [-2x | nhi | nlo | 1 | 1]  vs  q_aug = [q | 1 | 1 | qhi | qlo]
           → score = ‖x‖² − 2 q·x + ‖q‖²  (true squared distance, >= ~0)
      ip:  x_aug = [-x | 1]                vs  q_aug = [q | C_q]
           → score = C_q − q·x >= 0 with C_q = 1.02·‖q‖·max‖x‖

    The -2x scaling is an exact exponent shift; norms are of the
    *scan-dtype-rounded* vectors so the matmul reconstructs them exactly
    (see _scan_kernel_shifted). Padding rows (index >= n) get nhi=+inf
    (l2) / +inf in the C_q column (ip) — either way their score is +inf,
    so they never win a bin.
    """
    import ml_dtypes

    n_pad, d = x_lo_pad.shape
    xr = x_lo_pad.astype(ml_dtypes.bfloat16).astype(np.float32)
    if metric == "l2":
        nsq = (xr * xr).sum(-1)
        nhi, nlo = _split_hi_lo(nsq)
        aug = np.zeros((n_pad, d + 4), np.float32)
        aug[:, :d] = -2.0 * xr
        aug[:, d] = nhi
        aug[:, d + 1] = nlo
        aug[:, d + 2] = 1.0
        aug[:, d + 3] = 1.0
        aug[n:, :] = 0.0
        aug[n:, d] = np.inf
        return aug
    aug = np.zeros((n_pad, d + 1), np.float32)
    aug[:, :d] = -xr
    aug[:, d] = 1.0
    aug[n:, :] = 0.0
    aug[n:, d] = np.inf    # C_q >= 1 ⇒ padding score = +inf → always loses
    return aug


def augment_queries(q: jax.Array, metric: str, max_norm: float) -> jax.Array:
    """Device-side query augmentation matching ``augment_corpus``."""
    d = q.shape[1]
    qb = q.astype(jnp.bfloat16).astype(jnp.float32)
    if metric == "l2":
        qsq = jnp.sum(qb * qb, axis=1)
        qhi = qsq.astype(jnp.bfloat16).astype(jnp.float32)
        qlo = qsq - qhi
        ones = jnp.ones_like(qsq)
        return jnp.concatenate(
            [q, ones[:, None], ones[:, None], qhi[:, None], qlo[:, None]],
            axis=1)
    cq = 1.02 * jnp.sqrt(jnp.sum(qb * qb, axis=1)) * max_norm + 1.0
    return jnp.concatenate([q, cq[:, None]], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("bin_size", "chunk", "tq", "interpret"),
)
def shifted_scan(q_aug, x_aug, *, bin_size: int = 1024, chunk: int = 16384,
                 tq: int = 512, interpret: bool = False):
    """Bin winners via the shifted-key kernel: ``(vals (B, n_bins) f32
    — per-query-shifted scores, monotone within a query — , ids int32)``.

    q_aug (B, d_aug) f32 (cast to x dtype inside); x_aug (n_pad, d_aug)
    from ``augment_corpus``, n_pad a multiple of ``chunk``.
    """
    B, d_aug = q_aug.shape
    n_pad = x_aug.shape[0]
    if x_aug.shape[1] != d_aug:
        raise ValueError(f"q_aug width {d_aug} != x_aug width "
                         f"{x_aug.shape[1]} (augment mismatch)")
    assert n_pad % chunk == 0 and chunk % bin_size == 0
    if bin_size & (bin_size - 1):
        raise ValueError("shifted selection needs power-of-two bin_size")
    n_chunks = n_pad // chunk
    n_bins_c = chunk // bin_size
    n_bins = n_pad // bin_size
    Bp = _round_up(B, tq)
    qp = jnp.pad(q_aug, ((0, Bp - B), (0, 0))).astype(x_aug.dtype)
    b_tiles = Bp // tq

    kernel = functools.partial(_scan_kernel_shifted, n_bins_c=n_bins_c,
                               bin_size=bin_size)
    vals, ids = pl.pallas_call(
        kernel,
        grid=(n_chunks, b_tiles),
        in_specs=[
            pl.BlockSpec((tq, d_aug), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_aug), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_bins_c, tq), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins_c, tq), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_bins, Bp), jnp.float32),
            jax.ShapeDtypeStruct((n_bins, Bp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * n_pad * d_aug,
            bytes_accessed=(n_pad * d_aug * x_aug.dtype.itemsize * b_tiles
                            + Bp * d_aug * 4 + Bp * n_bins * 8),
            transcendentals=0),
        interpret=interpret,
    )(qp, x_aug)
    return vals[:, :B].T, ids[:, :B].T


@functools.partial(
    jax.jit,
    static_argnames=("metric", "bin_size", "chunk", "tq", "interpret",
                     "packed", "prescaled", "transpose", "quant"),
)
def binned_scan(q, x, addvec, qshift=None, *, metric: str = "l2",
                bin_size: int = 1024, chunk: int = 16384, tq: int = 512,
                interpret: bool = False, packed: bool = True,
                prescaled: bool = False, transpose: bool = True,
                quant: bool = False):
    """Bin winners of the full scan: ``(vals (B, n_bins) f32, ids int32)``.

    q (B, d) — cast to x.dtype inside; x (n_pad, d) with n_pad a multiple
    of ``chunk``; addvec (n_pad,) f32 — ``‖x‖²`` for L2 (+inf on padding),
    or 0/+inf for ip/angular.

    ``quant=True``: int8 scan — q and x are int8, the MXU contracts to
    int32, and ``qshift`` carries the per-query dequantization factor
    (alpha) instead of a shift; addvec is the norm of the DEQUANTIZED
    corpus so scores are exact distances of the quantized vectors.
    """
    B, d = q.shape
    n_pad = x.shape[0]
    assert n_pad % chunk == 0 and chunk % bin_size == 0
    n_chunks = n_pad // chunk
    n_bins_c = chunk // bin_size
    n_bins = n_pad // bin_size
    Bp = _round_up(B, tq)
    qp = jnp.pad(q, ((0, Bp - B), (0, 0))).astype(x.dtype)
    b_tiles = Bp // tq
    shifted = qshift is not None and not quant
    if quant and qshift is None:
        raise ValueError("quant=True needs qshift = per-query alpha")
    if quant and (q.dtype != jnp.int8 or x.dtype != jnp.int8):
        raise ValueError(f"quant=True needs int8 q and x, got {q.dtype} "
                         f"/ {x.dtype} (an astype here would truncate)")
    qs = (jnp.pad(qshift.astype(jnp.float32), ((0, Bp - B),))
          if qshift is not None
          else jnp.zeros((Bp,), jnp.float32)).reshape(1, Bp)

    if packed and (bin_size & (bin_size - 1)):
        raise ValueError("packed selection needs power-of-two bin_size")
    kernel = functools.partial(_scan_kernel, n_bins_c=n_bins_c,
                               bin_size=bin_size, l2=metric == "l2",
                               packed=packed, prescaled=prescaled,
                               shifted=shifted, quant=quant)
    grid = (n_chunks, b_tiles)
    vals, ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_bins_c, tq), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins_c, tq), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_bins, Bp), jnp.float32),
            jax.ShapeDtypeStruct((n_bins, Bp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * n_pad * d,
            bytes_accessed=(n_pad * d * x.dtype.itemsize * b_tiles
                            + Bp * d * 4 + Bp * n_bins * 8),
            transcendentals=0),
        interpret=interpret,
    )(qp, x, addvec.reshape(1, n_pad).astype(jnp.float32), qs)
    if not transpose:
        # bin-major raw output for merge_topc (padding queries beyond B are
        # garbage columns the caller slices off after the merge)
        return vals, ids
    # back to query-major for the final merge (cheap: (n_bins, B) transpose)
    return vals[:, :B].T, ids[:, :B].T


_PINF = float("inf")

# Interpret-mode pallas unrolls the grid into the traced jaxpr (one kernel
# body per cell), and XLA-CPU compile time grows superlinearly in graph
# size: the 10M-row scan (9,766 cells at the CPU chunk cap of 1024) sat in
# compile for 2+ hours where 2M (1,954 cells) took 40 s total. Cap the
# cells per traced call and stitch corpus segments on the host instead —
# segment boundaries are chunk-aligned (hence bin-aligned), so per-bin
# winners are bit-identical to the unsegmented scan.
_INTERPRET_MAX_CHUNKS = 512


def _flip(bits):
    """IEEE-f32 signed-int total order (see _scan_kernel packed mode)."""
    return jnp.where(bits < 0, bits ^ 0x7FFFFFFF, bits)


def _gated_topm_kernel(mask_ref, q_ref, x_ref, add_ref, val_ref, idx_ref,
                       ks_ref, is_ref, *, sub: int, fine: int, m: int,
                       n_btiles: int):
    """Cluster-gated cell producing the chunk's TOP-M candidates per query.

    Two-level selection (the VERDICT r2 'two-level hierarchical min'):
      1. per ``sub``-row matmul block, packed-key min per ``fine``-row
         group -> (chunk/fine) fine-bin winners per query, staged in VMEM
         scratch as ORDERED KEYS carrying the fine-bin id in the low bits
         (ks_ref; is_ref holds each bin winner's global position);
      2. m rounds over the (chunk/fine, TQ) key scratch: integer min
         yields the winning bin + quantized score in one pass, a one-hot
         eq extracts the position, and the winner's key is masked to
         INT32_MAX. The key build happens ONCE (level-1 writes final
         keys), so each round costs ~5 elementwise passes.

    Rationale: the gated index stores the corpus CLUSTER-MAJOR, so a
    query's true top-k concentrates inside one chunk — top-1-per-bin
    selection loses most of them to bin collisions (measured R@10 0.78 at
    full probes). Per-chunk top-m is collision-free for k <= m while
    keeping the merge width at m * n_chunks. Skipped cells (tile mask 0)
    write +inf winners, which the final merge discards.
    """
    j = pl.program_id(0)
    i = pl.program_id(1)
    keep = mask_ref[j * n_btiles + i] > 0
    cn = x_ref.shape[0]
    base_col = j * cn
    nfb = cn // fine                       # fine bins per chunk
    sub_mask = sub - 1                     # sub is a power of two
    # the key's low-bit field must hold BOTH the level-1 in-block row
    # (< sub) and the level-2 global fine-bin id (< nfb): quantize the
    # score by max(sub, nfb) — 10-13 bits of mantissa, absorbed by the
    # exact re-rank like the binned kernel's packed mode
    km = max(sub, nfb) - 1
    fb_mask = nfb - 1

    @pl.when(keep)
    def _():
        q = q_ref[:]
        tq = q.shape[0]
        # ---- level 1: fine-bin winner KEYS over `sub`-row blocks -------
        for s in range(cn // sub):
            xb = x_ref[s * sub:(s + 1) * sub, :]
            dots = jax.lax.dot_general(
                xb, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (sub, TQ)
            addb = add_ref[0, s * sub:(s + 1) * sub]
            scores = addb[:, None] + dots      # prescaled -2x / -x corpus
            bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
            iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
            pkey = (_flip(bits) & ~sub_mask) | iota
            # leading-axis split is layout-trivial; min over the fine axis
            kmin = jnp.min(pkey.reshape(sub // fine, fine, tq), axis=1)
            row = kmin & sub_mask              # position within the block
            rows = slice(s * (sub // fine), (s + 1) * (sub // fine))
            bin_iota = jax.lax.broadcasted_iota(
                jnp.int32, (sub // fine, tq), 0) + s * (sub // fine)
            # final level-2 key: ordered score bits | global fine-bin id
            ks_ref[rows, :] = (kmin & ~km) | bin_iota
            is_ref[rows, :] = row + (base_col + s * sub)

        # ---- level 2: m extract-and-mask rounds over the key scratch ---
        # (keys were finalized by level 1: each round is min + one-hot
        # idx extract + mask — ~5 elementwise passes over (nfb, TQ))
        iota_fb = jax.lax.broadcasted_iota(jnp.int32, (nfb, tq), 0)
        for t in range(m):
            pmin2 = jnp.min(ks_ref[:], axis=0)                # (TQ,)
            win_bin = pmin2 & fb_mask
            eq = iota_fb == win_bin[None, :]
            val_ref[t, :] = jax.lax.bitcast_convert_type(
                _flip(pmin2 & ~km), jnp.float32)
            idx_ref[t, :] = jnp.min(
                jnp.where(eq, is_ref[:], 0x7FFFFFFF), axis=0)
            if t + 1 < m:
                ks_ref[:] = jnp.where(eq, 0x7FFFFFFF, ks_ref[:])

    @pl.when(jnp.logical_not(keep))
    def _():
        val_ref[:] = jnp.full(val_ref.shape, _PINF, jnp.float32)
        idx_ref[:] = jnp.full(idx_ref.shape, -1, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "fine", "m", "sub", "chunk", "tq",
                     "interpret"),
)
def gated_topm_scan(q, x, addvec, tile_mask, *, metric: str = "l2",
                    fine: int = 128, m: int = 16, sub: int = 1024,
                    chunk: int = 16384, tq: int = 1024,
                    interpret: bool = False):
    """Cluster-gated per-chunk top-m candidates: ``(vals (B, m*n_chunks)
    f32, ids int32 — positions in x, -1 on skipped cells)``.

    q (B, d) with B a multiple of ``tq`` (caller pads; the mask layout
    must match); x (n_pad, d) PRESCALED (-2x for l2, -x for ip),
    cluster-major + fine-interleaved (see search/gated.py); addvec
    (n_pad,) as in binned_scan; tile_mask (n_chunks * B/tq,) int32,
    entry ``j * b_tiles + i`` gates corpus chunk j vs query tile i.
    """
    B, d = q.shape
    n_pad = x.shape[0]
    assert n_pad % chunk == 0 and chunk % sub == 0 and sub % fine == 0
    assert B % tq == 0, "gated scan needs the caller to pad B to tq"
    for v, name in ((fine, "fine"), (sub, "sub"), (m, "m")):
        if v & (v - 1):
            raise ValueError(f"{name} must be a power of two, got {v}")
    if m > chunk // fine:
        raise ValueError(f"m={m} > fine bins per chunk {chunk // fine}")
    n_chunks = n_pad // chunk
    b_tiles = B // tq
    assert tile_mask.shape == (n_chunks * b_tiles,), tile_mask.shape

    kernel = functools.partial(_gated_topm_kernel, sub=sub, fine=fine,
                               m=m, n_btiles=b_tiles)

    def _x_map(j, i, msk):
        # skipped cells point at chunk 0: runs of skipped cells share the
        # block index, so the pipeline elides their corpus reloads —
        # matters at small tq, where kept-cell locality is won at the
        # price of more (chunk x tile) visits
        return jnp.where(msk[j * b_tiles + i] > 0, j, 0), 0

    def _add_map(j, i, msk):
        return 0, jnp.where(msk[j * b_tiles + i] > 0, j, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks, b_tiles),
        in_specs=[
            pl.BlockSpec((tq, d), lambda j, i, *_: (i, 0)),
            pl.BlockSpec((chunk, d), _x_map),
            pl.BlockSpec((1, chunk), _add_map),
        ],
        out_specs=[
            pl.BlockSpec((m, tq), lambda j, i, *_: (j, i)),
            pl.BlockSpec((m, tq), lambda j, i, *_: (j, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((chunk // fine, tq), jnp.int32),   # ordered keys
            pltpu.VMEM((chunk // fine, tq), jnp.int32),   # global positions
        ],
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m * n_chunks, B), jnp.float32),
            jax.ShapeDtypeStruct((m * n_chunks, B), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * d,
            bytes_accessed=(n_pad * d * x.dtype.itemsize * b_tiles
                            + B * d * 4 + B * m * n_chunks * 8),
            transcendentals=0),
        interpret=interpret,
    )(tile_mask.astype(jnp.int32), q.astype(x.dtype), x,
      addvec.reshape(1, n_pad).astype(jnp.float32))
    return vals.T, ids.T


def _merge_topc_kernel(val_ref, idx_ref, oval_ref, oidx_ref, ks_ref, *,
                       c: int, rb: int):
    """Top-c extraction over one (rb, tq) block of bin winners.

    Consumes the scan kernel's NATIVE bin-major layout — no (n_bins, B)
    transpose, no wide ``lax.top_k``. Same packed-key min-extract pattern
    as ``_gated_topm_kernel`` level 2: the f32 score's IEEE bits are
    flipped into signed-int total order, the low ``log2(rb)`` bits are
    replaced by the in-block row index (score quantized ~2^-13 relative —
    absorbed by the exact re-rank like the scan's packed mode), then each
    of the c rounds is one sublane integer min + a one-hot id extract +
    a winner mask-out. Padding rows carry +inf scores and id -1, so they
    only surface when a query has fewer than c real candidates — the
    re-rank masks id<0 slots.
    """
    mask = rb - 1
    bits = jax.lax.bitcast_convert_type(val_ref[:], jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, val_ref.shape, 0)
    ks_ref[:] = (_flip(bits) & ~mask) | iota
    for t in range(c):
        pmin = jnp.min(ks_ref[:], axis=0)
        eq = iota == (pmin & mask)[None, :]
        oval_ref[t, :] = jax.lax.bitcast_convert_type(
            _flip(pmin & ~mask), jnp.float32)
        oidx_ref[t, :] = jnp.min(
            jnp.where(eq, idx_ref[:], 0x7FFFFFFF), axis=0)
        if t + 1 < c:
            ks_ref[:] = jnp.where(eq, 0x7FFFFFFF, ks_ref[:])


def _merge_topc_stage(vals, ids, c: int, rb: int, tq: int, interpret: bool):
    """One gridded pass: (R, Bp) bin-major winners → (c * r_blocks, Bp)."""
    R, Bp = vals.shape
    R_pad = _round_up(R, rb)
    if R_pad != R:
        vals = jnp.pad(vals, ((0, R_pad - R), (0, 0)),
                       constant_values=_PINF)
        ids = jnp.pad(ids, ((0, R_pad - R), (0, 0)), constant_values=-1)
    r_blocks = R_pad // rb
    b_tiles = Bp // tq
    kernel = functools.partial(_merge_topc_kernel, c=c, rb=rb)
    return pl.pallas_call(
        kernel,
        grid=(r_blocks, b_tiles),
        in_specs=[
            pl.BlockSpec((rb, tq), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, tq), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((c, tq), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tq), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c * r_blocks, Bp), jnp.float32),
            jax.ShapeDtypeStruct((c * r_blocks, Bp), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((rb, tq), jnp.int32)],
        interpret=interpret,
    )(vals, ids)


@functools.partial(jax.jit, static_argnames=("c", "valid_b", "rb", "tq",
                                             "interpret"))
def merge_topc(vals, ids, c: int, *, valid_b: int, rb: int = 512,
               tq: int = 512, interpret: bool = False):
    """Top-c merge of bin-major scan winners: ``vals/ids (n_bins, Bp)``
    (from ``binned_scan(..., transpose=False)``) → ``(vals (B, c) f32,
    ids (B, c) int32)``, candidates sorted ascending by (quantized) score.

    Hierarchical when n_bins > rb: each stage reduces rb-row blocks to
    their top-c, recursing until one block remains (10M at bin=1024 is
    9766 bins → 2 stages). c is rounded up to 8 in-kernel so output
    blocks satisfy the (8, 128) f32 tile constraint.

    Large pools: a stage needs ``ck*2 <= rb``; when c exceeds rb//2 the
    block size is raised to the next power of two (capped at 2048 to
    stay inside the VMEM budget: scratch+operands at rb=2048/tq=512 is
    ~12 MB), and beyond that the merge falls back to one XLA
    ``lax.top_k`` over the transposed winners — same contract, slower,
    instead of the pre-round-4 ValueError (ef >= 257 sweeps used to
    crash every pallas-merge consumer).
    """
    ck = _round_up(max(c, 8), 8)
    if ck * 2 > rb:
        rb = 1 << (ck * 2 - 1).bit_length()
    if rb > 2048 or c >= vals.shape[0]:
        # pool wider than the largest supported block (or no reduction to
        # do at all): exact XLA merge over query-major winners
        cc = min(c, vals.shape[0])
        v, i = vals[:, :valid_b].T, ids[:, :valid_b].T
        neg, sel = jax.lax.top_k(-v, cc)
        return -neg, jnp.take_along_axis(i, sel, axis=1)
    Bp = vals.shape[1]
    if Bp % tq:
        pad = _round_up(Bp, tq) - Bp
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
        ids = jnp.pad(ids, ((0, 0), (0, pad)))
    while True:
        vals, ids = _merge_topc_stage(vals, ids, ck, rb, tq, interpret)
        if vals.shape[0] == ck:
            break
    return vals[:c, :valid_b].T, ids[:c, :valid_b].T


class FusedScanIndex:
    """Flat index whose candidate scan is the fused Pallas kernel.

    Drop-in alternative to search.flat.FlatIndex for large corpora: same
    (reduced-space scan → full-dim re-rank) contract, but the scan never
    writes scores to HBM. ``c`` (re-rank pool) is the recall knob.
    """

    def __init__(self, base_full, base_lo=None, *, metric: str = "l2",
                 scan_dtype=jnp.bfloat16, bin_size: int = 1024,
                 chunk: int = 16384, tq: int = 1024, packed: bool = False,
                 mode: str = "binned", rerank_dtype=jnp.float32):
        # tq=1024 measured +2.5% over 512 at 1M (fewer corpus reloads:
        # b_tiles halves); chunk>16384 exceeds the 16MB VMEM budget.
        # packed=False (plain min+argmin) measured ~7% faster than the
        # packed int-key epilogue at 1M x 16k (28.16 vs 30.30 ms/batch —
        # Mosaic fuses the min/argmin pair; results/epilogue_study_1m.md):
        # the round-2 op-count model that motivated packing was wrong, the
        # kernel is MXU-output-rate-bound and the epilogue overlaps it.
        self.packed = packed
        # int8 quantized scan: 2x MXU rate on v5e (394 TOPS int8 vs 197
        # TFLOPS bf16) where the kernel is matmul-bound (which it is at
        # d_lo=32: scan 28.16 ms vs matmul-only 27.63 at 1M x 16k,
        # results/epilogue_study_1m.jsonl). Per-tensor corpus scale +
        # per-query query scale; selection is exact for the QUANTIZED
        # vectors and the full-dim re-rank absorbs the rounding.
        self.quant = scan_dtype in ("int8", jnp.int8)
        if metric not in ("l2", "ip", "angular"):
            raise ValueError(f"unknown metric {metric!r}")
        if mode not in ("shifted", "binned"):
            raise ValueError(f"unknown mode {mode!r}")
        if self.quant and mode == "shifted":
            raise ValueError("int8 scan requires mode='binned'")
        self.metric = metric
        self.mode = mode
        # CPU/interpret fallback keeps tests + docs snippets runnable
        # off-TPU. The TPU-tuned geometry is pathological there: interpret
        # mode traces one dot_general PER BIN per grid cell (chunk/bin of
        # them — the small-corpus bin cap can push that to 2048), so cap
        # the chunk to keep the traced loop short.
        self.interpret = jax.default_backend() != "tpu"
        if self.interpret:
            chunk = min(chunk, 1024)
            tq = min(tq, 256)
        self.bin_size = bin_size
        self.chunk = chunk
        self.tq = tq
        base_full = np.asarray(base_full, np.float32)
        lo = base_full if base_lo is None else np.asarray(base_lo, np.float32)
        n, d_lo = lo.shape
        self.n = n
        n_pad = _round_up(n, chunk)
        # small-corpus guard: one winner per bin means n/bin_size is the
        # candidate pool ceiling — keep >= ~128 REAL bins so top-10
        # queries aren't starved (a 20k corpus at the 1M-tuned bin of 1024
        # had only 20 bins: R@10 capped at ~0.8 regardless of c; counting
        # n_pad here over-credited padding bins, whose winners are +inf)
        cap = max(8, 1 << max(3, (n // 128).bit_length() - 1))
        self.bin_size = bin_size = min(bin_size, cap)
        lo_pad = np.zeros((n_pad, d_lo), np.float32)
        lo_pad[:n] = lo
        if mode == "shifted":
            self.x_aug = jnp.asarray(augment_corpus(lo_pad, n, metric),
                                     dtype=scan_dtype)
            self.max_norm = float(np.sqrt((lo ** 2).sum(-1).max()))
        else:
            if metric == "l2":
                add = (lo_pad ** 2).sum(-1)
                add[n:] = np.inf
                scale = -2.0
            else:
                add = np.zeros(n_pad, np.float32)
                add[n:] = np.inf
                scale = -1.0
            if self.quant:
                # symmetric per-tensor int8; addvec from the DEQUANTIZED
                # corpus so scores are exact distances of what was stored
                self.sx = float(127.0 / (np.abs(lo).max() or 1.0))
                xi = np.clip(np.rint(lo_pad * self.sx), -127, 127)
                if metric == "l2":
                    xq = xi[:n] / self.sx
                    add[:n] = (xq * xq).sum(-1)
                self.x_lo = jnp.asarray(xi.astype(np.int8))
            else:
                # prescaled storage: the -2x/-x factor is exact in bf16
                # (exponent shift + sign), see _scan_kernel prescaled
                self.x_lo = jnp.asarray(scale * lo_pad, dtype=scan_dtype)
            self.addvec = jnp.asarray(add)
            # per-query shift bound for ip/angular (l2 uses ‖q‖² exactly)
            self.max_norm = float(np.sqrt((lo ** 2).sum(-1).max())) or 1.0
        # rerank_dtype=bf16 halves the re-rank's candidate-row gather
        # bytes AND the full-dim corpus HBM footprint (5 GB -> 2.5 GB at
        # 10M x 96d). Only the -2q·x dot term sees the rounding: the
        # squared norms below stay f32 and are computed BEFORE the cast.
        self.base_sq = jnp.sum(jnp.asarray(base_full) ** 2, axis=-1)
        self.base_full = jnp.asarray(base_full, dtype=rerank_dtype)

    def _binned_scan_segmented(self, q_scan, scan_kw, *, transpose: bool):
        """binned_scan, segmented over the corpus when interpret-mode
        tracing would unroll more than _INTERPRET_MAX_CHUNKS grid cells
        per call (see the constant's comment). Winners are bit-identical:
        segments are chunk-aligned, bins never straddle a boundary, and
        the per-segment local ids are shifted back to corpus ids."""
        n_pad = self.x_lo.shape[0]
        seg = _INTERPRET_MAX_CHUNKS * self.chunk
        if not self.interpret or n_pad <= seg:
            return binned_scan(q_scan, self.x_lo, self.addvec,
                               transpose=transpose, **scan_kw)
        vs, ids = [], []
        for s in range(0, n_pad, seg):
            v, i = binned_scan(q_scan, self.x_lo[s:s + seg],
                               self.addvec[s:s + seg],
                               transpose=transpose, **scan_kw)
            vs.append(v)
            ids.append(i + s)
        ax = 1 if transpose else 0
        return jnp.concatenate(vs, axis=ax), jnp.concatenate(ids, axis=ax)

    def candidates(self, queries_lo, *, c: int = 32,
                   merge: str | None = None):
        """Re-rank candidate pool only: (B, <=c) int32 corpus ids, best
        (quantized) projected score first. This is ``search`` minus the
        full-dim re-rank — candidate-quality studies (recall@c as a
        function of the projection) need exactly this and must not pay
        the 512 MB full-dim corpus upload per projection variant."""
        if merge is None:
            merge = "exact" if self.interpret else "pallas"
        ql = jnp.asarray(queries_lo, dtype=jnp.float32)
        if self.mode == "shifted":
            q_aug = augment_queries(ql, self.metric,
                                    getattr(self, "max_norm", 1.0))
            vals, ids = shifted_scan(q_aug, self.x_aug,
                                     bin_size=self.bin_size, chunk=self.chunk,
                                     tq=self.tq, interpret=self.interpret)
        else:
            if self.quant:
                # per-query symmetric int8 + per-query dequant factor: a
                # positive per-query scale on the dot term cannot change
                # that query's ranking (see _scan_kernel quant)
                sq = 127.0 / jnp.maximum(jnp.max(jnp.abs(ql), axis=1), 1e-30)
                q_scan = jnp.clip(jnp.round(ql * sq[:, None]),
                                  -127, 127).astype(jnp.int8)
                dot_scale = -2.0 if self.metric == "l2" else -1.0
                kw = dict(qshift=dot_scale / (self.sx * sq), quant=True,
                          prescaled=False)
            else:
                q_scan, kw = ql, dict(prescaled=True)
            scan_kw = dict(metric=self.metric, bin_size=self.bin_size,
                           chunk=self.chunk, tq=self.tq,
                           interpret=self.interpret, packed=self.packed,
                           **kw)
            if merge == "pallas":
                raw_v, raw_i = self._binned_scan_segmented(
                    q_scan, scan_kw, transpose=False)
                cc = min(c, raw_v.shape[0])
                _, cand = merge_topc(raw_v, raw_i, cc, valid_b=ql.shape[0],
                                     interpret=self.interpret)
                return cand
            vals, ids = self._binned_scan_segmented(
                q_scan, scan_kw, transpose=True)
        cc = min(c, vals.shape[1])
        if merge == "approx" and not self.interpret:
            _, sel = jax.lax.approx_max_k(-vals, cc, recall_target=0.95)
        else:
            _, sel = jax.lax.top_k(-vals, cc)
        return jnp.take_along_axis(ids, sel, axis=1)

    def search(self, queries_full, queries_lo=None, *, k: int = 10,
               c: int = 32, merge: str | None = None):
        """``merge`` selects how the c re-rank candidates come out of the
        bin winners:

        * ``"pallas"`` (fastest) — ``merge_topc``: packed-key min-extract
          rounds over the scan's native bin-major layout; skips the
          (n_bins, B) transpose AND the wide top_k entirely (28.84 vs
          35.27 ms/batch at 1M x 16k, results/tail_decomp_1m.jsonl).
        * ``"approx"`` — ``approx_max_k`` over the transposed winners:
          measured +7% QPS for -0.4% R@10 at 1M/c=16 vs exact.
        * ``"exact"`` — ``lax.top_k`` (12 ms of the 47 ms round-2 batch).
        * ``None`` (default) — "pallas" on TPU, "exact" under interpret
          (interpret-mode pallas is orders slower than lax.top_k on CPU).

        All three feed the same exact full-dim re-rank, so results agree
        up to quantization ties at the pool boundary.
        """
        from gbnns_tpu.search.rerank import rerank

        qf = jnp.asarray(queries_full, dtype=jnp.float32)
        ql = qf if queries_lo is None else queries_lo
        cand = self.candidates(ql, c=c, merge=merge)
        return rerank(qf, self.base_full, cand, k, metric=self.metric,
                      base_sqnorms=self.base_sq)
