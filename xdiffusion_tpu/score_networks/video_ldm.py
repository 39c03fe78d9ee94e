"""Video-LDM: temporal adapters over a (frozen) image UNet.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/video_ldm.py:20-342 ("Align your Latents", arXiv:2304.08818):
an image UNet runs per-frame; after each stage a temporal layer (3D-conv
adapter + temporal attention) mixes frames, and a learned per-stage blend
alpha interpolates between the image-only path (alpha=1 at init) and the
temporal path — so image weights load untouched and only temporal layers
train (reference load_checkpoint permits exactly the missing temporal
keys).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.attention import TemporalSelfAttention
from xdiffusion_tpu.score_networks.unet_3d import (
    Unet as _VideoUnet,
    _fold,
    _unfold,
)


class TemporalAdapter(nn.Module):
    """3D-conv + temporal attention with a learned image/video blend."""

    channels: int
    num_frames: int

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # x: (B, F, H, W, C)
        b, f, h, w, c = x.shape
        # Temporal conv adapter (zero-init -> starts as identity path).
        seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        z = nn.Conv(
            c, (3,), padding="SAME", kernel_init=nn.initializers.zeros,
            name="temporal_conv",
        )(seq)
        z = z.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        z = TemporalSelfAttention(
            in_channels=c,
            temporal_sequence_length=self.num_frames,
            max_relative_position=self.num_frames,
            heads=max(1, c // 64),
            dim_head=-1,
            name="temporal_attn",
        )(x + z, deterministic=deterministic)
        # alpha=1 at init: pure image path (Video-LDM Eq. 2 mixing).
        alpha = self.param("alpha", nn.initializers.ones, ())
        a = jax.nn.sigmoid(alpha * 8.0)  # init sigmoid(8) ~ 1.0
        return a * x + (1.0 - a) * z


class Unet(_VideoUnet):
    """Video-LDM UNet: image stages + blended temporal adapters."""

    def setup(self):
        super().setup()
        n_stages = len(self._downs) + 1 + len(self._ups)
        self._adapters = [
            TemporalAdapter(
                channels=-1, num_frames=self._num_frames, name=f"adapter_{i}"
            )
            for i in range(n_stages)
        ]

    def _post_stage(self, h, f, stage_id):
        return _fold(self._adapters[stage_id](_unfold(h, f)))[0]


# Reference configs name the class VideoLDMUnet.
VideoLDMUnet = Unet
