"""AnimateDiff: motion modules on a base image UNet.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/animate_diff.py:46-431 ("AnimateDiff", arXiv:2307.04725):
the base (image) UNet runs per-frame; zero-initialized temporal
transformer "motion modules" (temporal self-attention blocks with
sinusoidal frame-position encoding) are inserted after each stage, so the
model starts exactly at the image model and only motion modules learn
video dynamics (image->video weight transfer like Video-LDM).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import sinusoidal_embedding
from xdiffusion_tpu.ops import dot_product_attention
from xdiffusion_tpu.score_networks.unet_3d import (
    Unet as _VideoUnet,
    _fold,
    _unfold,
)


class MotionModule(nn.Module):
    """Temporal transformer block with zero-init output projection."""

    num_frames: int
    heads: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, f, h, w, c = x.shape
        seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        # Sinusoidal frame-position encoding (AnimateDiff motion module).
        pos = sinusoidal_embedding(
            jnp.arange(f, dtype=jnp.float32), c if c % 2 == 0 else c + 1
        )[:, :c]
        hseq = nn.LayerNorm(name="norm")(seq) + pos[None]
        num_heads = max(1, min(self.heads, c // 8))
        head_dim = c // num_heads
        qkv = nn.Dense(3 * c, name="qkv")(hseq)
        q, k, v = (
            t.reshape(b * h * w, f, num_heads, head_dim).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        out = dot_product_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b * h * w, f, c)
        out = nn.Dense(
            c, kernel_init=nn.initializers.zeros, name="proj_out"
        )(out)
        out = out.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return x + out


class Unet(_VideoUnet):
    """Base UNet + per-stage motion modules."""

    def setup(self):
        super().setup()
        n_stages = len(self._downs) + 1 + len(self._ups)
        self._motion_modules = [
            MotionModule(num_frames=self._num_frames, name=f"motion_{i}")
            for i in range(n_stages)
        ]

    def _post_stage(self, h, f, stage_id):
        return _fold(self._motion_modules[stage_id](_unfold(h, f)))[0]


# Reference configs name the class AnimateDiffUnet.
AnimateDiffUnet = Unet
