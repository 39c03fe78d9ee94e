"""Small shared layers: MLP, stochastic depth, modulation, pooling.

Counterparts of the reference utility modules (layers/mlp.py,
layers/drop.py, layers/modulate.py, layers/pool.py, layers/residual.py,
layers/activation.py, layers/linear.py) collected in one place.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation over a token sequence (layers/modulate.py)."""
    return x * (1.0 + scale[:, None]) + shift[:, None]


class Mlp(nn.Module):
    """Transformer MLP (layers/mlp.py): fc -> act -> drop -> fc -> drop."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = nn.gelu
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        out = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, name="fc1")(x)
        x = self.act(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out, name="fc2")(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth (layers/drop.py): drop whole residual branches."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate <= 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return x * mask / keep


class Residual(nn.Module):
    """Wraps a callable as x + fn(x) (layers/residual.py)."""

    fn: Callable

    def __call__(self, x: jax.Array, *args, **kwargs) -> jax.Array:
        return x + self.fn(x, *args, **kwargs)


def down_avg_pool(x: jax.Array, stride: int = 2) -> jax.Array:
    """Sequence average pooling (layers/pool.py DownAvgPool): (B, L, D) ->
    (B, L/stride, D)."""
    if stride == 1:
        return x
    b, l, d = x.shape
    l2 = l - (l % stride)
    return x[:, :l2].reshape(b, l2 // stride, stride, d).mean(axis=2)


def up_repeat_pool(x: jax.Array, stride: int = 2) -> jax.Array:
    """Inverse of down_avg_pool by repetition."""
    return jnp.repeat(x, stride, axis=1)
