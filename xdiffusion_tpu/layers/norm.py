"""Normalization layers (RMSNorm, DynamicTanh, adaptive LayerNorms).

Counterpart of /root/reference/xdiffusion/layers/norm.py:9-248.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    """Root-mean-square norm with a learned scale (norm.py:109)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        x32 = x.astype(jnp.float32)
        rrms = jax.lax.rsqrt(jnp.mean(x32**2, axis=-1, keepdims=True) + self.eps)
        return (x32 * rrms).astype(x.dtype) * scale


class DynamicTanhNorm(nn.Module):
    """DyT: norm-free tanh(alpha*x) * gamma + beta ("Transformers without
    Normalization", reference norm.py:219). Drop-in LayerNorm replacement
    used by the *_dyt score-network variants."""

    dim: int
    alpha_init: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha", lambda key: jnp.full((), self.alpha_init)
        )
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        return jnp.tanh(alpha * x) * gamma + beta
