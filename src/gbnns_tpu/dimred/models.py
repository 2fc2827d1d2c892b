"""Dimensionality-reduction projection models.

Capability parity: the reference's PyTorch nets — a linear d→d' projection
and a small MLP variant, with an angular (normalized) flavor (SURVEY.md §3
"Dim-red nets"). TPU-first: flax modules whose forward is a single MXU
matmul (+ fused activation); parameters live in a plain pytree so the same
``apply_model`` serves training, on-device corpus projection, and query
projection at search time.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LinearProjection(nn.Module):
    """x @ W, W: (d, d_out). ``normalize=True`` L2-normalizes outputs so the
    reduced space preserves angular/IP geometry (reference's angular
    variant for GloVe, BASELINE.json:9)."""

    d_out: int
    normalize: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.d_out, use_bias=False, name="proj")(x)
        if self.normalize:
            y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
        return y


class MLPProjection(nn.Module):
    """Dense→ReLU→Dense nonlinear reduction (reference's "small MLP")."""

    d_out: int
    hidden: int = 512
    normalize: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hidden, name="hidden")(x))
        y = nn.Dense(self.d_out, use_bias=False, name="proj")(h)
        if self.normalize:
            y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
        return y


def make_model(kind: str, d_out: int, *, hidden: int = 512,
               normalize: bool = False) -> nn.Module:
    if kind == "linear":
        return LinearProjection(d_out=d_out, normalize=normalize)
    if kind == "mlp":
        return MLPProjection(d_out=d_out, hidden=hidden, normalize=normalize)
    raise ValueError(f"unknown projection model {kind!r} (want 'linear'|'mlp')")


def init_model(model: nn.Module, d_in: int, seed: int = 0):
    """Initialize parameters; linear models start at a random orthonormal
    basis (an isometry on its range) rather than tiny random noise, so
    step 0 already behaves like a random projection — the classical
    starting point the reference's trainer improves on."""
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, d_in)))
    if isinstance(model, LinearProjection):
        w = jax.random.orthogonal(jax.random.PRNGKey(seed),
                                  max(d_in, model.d_out))[:d_in, :model.d_out]
        params = {"params": {"proj": {"kernel": w.astype(jnp.float32)}}}
    return params


def apply_model(model: nn.Module, params, x: jax.Array) -> jax.Array:
    return model.apply(params, x)
