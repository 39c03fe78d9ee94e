"""Sequence pooling layers (reference: xdiffusion/layers/pool.py)."""

from __future__ import annotations

import jax
from flax import linen as nn


class DownAvgPool(nn.Module):
    """Average-pool the sequence axis of a (B, L, D) tensor by `stride`
    (reference: pool.py DownAvgPool). stride=1 is the identity."""

    stride: int = 1
    expand: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.stride > 1:
            x = nn.avg_pool(
                x, window_shape=(self.stride,), strides=(self.stride,)
            )
        if self.expand > 1:
            x = jax.numpy.repeat(x, self.expand, axis=-1)
        return x
