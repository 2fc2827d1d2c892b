"""Distance computation on the MXU.

Capability parity: the reference's brute-force distance engine (SIMD inner
product / L2 in C++; SURVEY.md §3 "kNN-graph builder", §4.1). TPU-first
design: every distance evaluation is phrased as a matmul so XLA tiles it onto
the 128x128 systolic array — L2 via the ``‖x‖² + ‖q‖² − 2·q·x`` expansion,
inner-product/angular via a plain dot. The elementwise norm additions fuse
into the matmul epilogue under jit.

Metrics (matching the reference corpora, BASELINE.json:7-11):
  * ``l2``      — squared Euclidean (monotone in true L2; never sqrt'd)
  * ``ip``      — negative inner product (max-IP as min-distance)
  * ``angular`` — negative cosine; callers pre-normalize vectors, after which
                  it equals ``ip``. Kept distinct for config clarity.

Precision: queries/base may be bfloat16 (MXU-native) with float32
accumulation via ``preferred_element_type``; exact ground truth should use
float32 inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

METRICS = ("l2", "ip", "angular")


def squared_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms, accumulated in float32. Shape (n,)."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)


@functools.partial(jax.jit, static_argnames=("metric", "precision"))
def pairwise_dists(q: jax.Array, x: jax.Array, *, metric: str = "l2",
                   x_sqnorms: jax.Array | None = None,
                   precision: str | None = None) -> jax.Array:
    """All-pairs distances ``(nq, n)`` between queries ``q (nq,d)`` and base
    ``x (n,d)``. Smaller is closer for every metric.

    ``x_sqnorms`` lets callers hoist the base-norm computation out of a
    chunked sweep (computed once per corpus, not once per tile).

    ``precision``: MXU matmul precision. On TPU the default lowers f32
    inputs to bfloat16 passes — fine for approximate search, but exact
    ground truth / re-rank should pass ``"highest"`` (3-pass bf16 ≈ true
    f32; measured self-distance error drops from ~2e-1 to ~1e-5 on
    unit-scale data).
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    # MXU contraction with f32 accumulation regardless of input dtype.
    dots = jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if metric in ("ip", "angular"):
        return -dots
    xs = squared_norms(x) if x_sqnorms is None else x_sqnorms.astype(jnp.float32)
    qs = squared_norms(q)
    # ‖q−x‖² = ‖q‖² − 2 q·x + ‖x‖²; ‖q‖² kept so distances are true squared
    # L2 (parity with the reference's re-rank semantics), clamped at 0 to
    # absorb cancellation error.
    return jnp.maximum(qs[:, None] - 2.0 * dots + xs[None, :], 0.0)
