"""PCA baseline for dimensionality reduction.

Capability parity: the reference's classical linear baseline (SURVEY.md §3
"PCA baseline") against which the learned triplet projection is compared.
TPU-first: the covariance is one MXU matmul (d x d, streamed over the
corpus in chunks) and the eigendecomposition runs on the d x d matrix only —
no O(n d²) host SVD.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PCAModel:
    mean: np.ndarray        # (d,)
    components: np.ndarray  # (d, d_out), columns = principal axes
    explained_variance: np.ndarray  # (d_out,)


def pca_fit(x, d_out: int, *, chunk: int = 262144) -> PCAModel:
    """Fit PCA on ``x (n, d)``; returns the top ``d_out`` principal axes.

    Covariance is accumulated in float32 on device over chunks, then
    ``eigh`` on the (d, d) matrix. Handles n up to HBM-streaming sizes.
    """
    x = np.asarray(x)
    n, d = x.shape
    if d_out > d:
        raise ValueError(f"d_out={d_out} > d={d}")
    mean = np.zeros(d, np.float64)
    for off in range(0, n, chunk):
        mean += x[off:off + chunk].astype(np.float64).sum(0)
    mean /= n
    mean32 = jnp.asarray(mean, dtype=jnp.float32)

    cov = jnp.zeros((d, d), jnp.float32)
    add = jax.jit(lambda cov, xc: cov + jax.lax.dot_general(
        xc - mean32[None, :], xc - mean32[None, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision="highest"))
    for off in range(0, n, chunk):
        cov = add(cov, jnp.asarray(x[off:off + chunk]))
    cov = cov / (n - 1)

    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    order = jnp.argsort(-evals)[:d_out]
    comps = evecs[:, order]
    return PCAModel(
        mean=np.asarray(mean, dtype=np.float32),
        components=np.asarray(comps),
        explained_variance=np.asarray(evals[order]),
    )


def pca_transform(model: PCAModel, x, *, normalize: bool = False) -> np.ndarray:
    """(n, d) → (n, d_out); optional L2 normalization for angular metrics."""
    xj = jnp.asarray(np.asarray(x))
    y = (xj - jnp.asarray(model.mean)[None, :]) @ jnp.asarray(model.components)
    if normalize:
        y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    return np.asarray(y)
