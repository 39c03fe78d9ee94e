"""Pseudo-3D UNet (Make-A-Video).

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/unet_pseudo3d.py:27-355 ("Make-A-Video", arXiv:2209.14792):
a 2D image UNet whose convolutions become pseudo-3D — each spatial conv is
followed by an identity-initialized 1D temporal conv over frames — plus
temporal attention after spatial attention. Identity-init means the model
starts exactly as its 2D image counterpart (enabling image->video weight
transfer, reference load_checkpoint's missing-temporal-keys contract).

Built as the factorized video UNet with temporal mixing convs interleaved.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.score_networks.unet_3d import (
    Unet as _VideoUnet,
    _fold,
    _unfold,
)


class TemporalConv1D(nn.Module):
    """Identity-initialized temporal 1D conv over the frame axis of a
    (B, F, H, W, C) map (the pseudo-conv3d trick, reference
    layers/utils.py:23)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, h, w, c = x.shape
        # Dirac (identity) kernel init + zero bias: starts as a no-op.
        def dirac(key, shape, dtype=jnp.float32):
            k = jnp.zeros(shape, dtype)
            return k.at[shape[0] // 2].set(jnp.eye(c, dtype=dtype))

        seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        out = nn.Conv(
            c,
            (self.kernel_size,),
            padding="SAME",
            kernel_init=dirac,
            name="conv",
        )(seq)
        return out.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)


class Unet(_VideoUnet):
    """Video UNet with pseudo-3D temporal convs after each stage."""

    def setup(self):
        super().setup()
        # One identity-initialized temporal mixing conv per pyramid stage
        # (downs + middle + ups).
        n_stages = len(self._downs) + 1 + len(self._ups)
        self._temporal_convs = [
            TemporalConv1D(name=f"tconv_{i}") for i in range(n_stages)
        ]

    def _post_stage(self, h, f, stage_id):
        return _fold(self._temporal_convs[stage_id](_unfold(h, f)))[0]
