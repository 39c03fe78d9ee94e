"""LDM-style VAE encoder/decoder (reference: autoencoders/layers.py:8-370).

NHWC, timestep-free residual blocks, mid-block self-attention, double-z
moment head on the encoder. Built from the same GroupNorm/SiLU/conv grammar
as the score networks so everything XLA-fuses the same way.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.resnet import avg_pool_2x, nearest_upsample_2x


def _gn(c: int, name: str, silu: bool = False):
    from xdiffusion_tpu.layers.resnet import FastGroupNorm

    # eps=1e-6: the reference VAE's Normalize() overrides torch's GroupNorm
    # default (reference autoencoders/layers.py:322-325); imported reference
    # checkpoints must normalize exactly as trained.
    return FastGroupNorm(
        num_groups=32 if c % 32 == 0 else max(1, c // 4),
        epsilon=1e-6,
        silu=silu,
        name=name,
    )


class VAEResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c_in = x.shape[-1]
        h = nn.Conv(self.out_channels, (3, 3), name="conv1")(
            _gn(c_in, "norm1", silu=True)(x)
        )
        h = _gn(self.out_channels, "norm2", silu=True)(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention over all h*w tokens.

    Matches the reference's LDM `AttnBlock` exactly (reference
    autoencoders/attention.py:35-78): separate q/k/v/proj 1x1 convs
    (= Dense over the channel axis) and ONE head with scale c**-0.5 —
    not multi-head — so imported torch checkpoints reproduce outputs.
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from xdiffusion_tpu.ops import attention_qkv

        b, h, w, c = x.shape
        n = _gn(c, "norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, name="q")(n)
        k = nn.Dense(c, name="k")(n)
        v = nn.Dense(c, name="v")(n)
        out = attention_qkv(q, k, v, heads=1)
        out = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj")(out)
        return x + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    z_channels: int
    attn_resolutions: Sequence[int] = ()
    resolution: int = 32
    dropout: float = 0.0
    double_z: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.Conv(self.ch, (3, 3), name="conv_in")(x)
        # `res` only gates attn_resolutions membership; rectangular inputs
        # (audio 64x128 log-mels) track their smaller side.
        res = self.resolution
        if isinstance(res, (list, tuple)):
            res = min(int(r) for r in res)
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = VAEResnetBlock(
                    out_channels=self.ch * mult,
                    dropout=self.dropout,
                    name=f"down_{level}_block_{i}",
                )(h, deterministic=deterministic)
                if res in self.attn_resolutions:
                    h = VAEAttnBlock(name=f"down_{level}_attn_{i}")(h)
            if level != len(self.ch_mult) - 1:
                h = nn.Conv(
                    h.shape[-1],
                    (3, 3),
                    strides=(2, 2),
                    name=f"down_{level}_downsample",
                )(h)
                res //= 2

        c_mid = h.shape[-1]
        h = VAEResnetBlock(out_channels=c_mid, dropout=self.dropout,
                           name="mid_block_1")(h, deterministic=deterministic)
        h = VAEAttnBlock(name="mid_attn")(h)
        h = VAEResnetBlock(out_channels=c_mid, dropout=self.dropout,
                           name="mid_block_2")(h, deterministic=deterministic)

        h = _gn(c_mid, "norm_out", silu=True)(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), name="conv_out")(h)


class Decoder(nn.Module):
    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    z_channels: int
    out_ch: int = 3
    attn_resolutions: Sequence[int] = ()
    resolution: int = 32
    dropout: float = 0.0
    double_z: bool = True  # unused; kept for config symmetry

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        c_top = self.ch * self.ch_mult[-1]
        h = nn.Conv(c_top, (3, 3), name="conv_in")(z)
        h = VAEResnetBlock(out_channels=c_top, dropout=self.dropout,
                           name="mid_block_1")(h, deterministic=deterministic)
        h = VAEAttnBlock(name="mid_attn")(h)
        h = VAEResnetBlock(out_channels=c_top, dropout=self.dropout,
                           name="mid_block_2")(h, deterministic=deterministic)

        res = self.resolution
        if isinstance(res, (list, tuple)):
            res = min(int(r) for r in res)
        res //= 2 ** (len(self.ch_mult) - 1)
        for level, mult in reversed(list(enumerate(self.ch_mult))):
            for i in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(
                    out_channels=self.ch * mult,
                    dropout=self.dropout,
                    name=f"up_{level}_block_{i}",
                )(h, deterministic=deterministic)
                if res in self.attn_resolutions:
                    h = VAEAttnBlock(name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                h = nearest_upsample_2x(h)
                h = nn.Conv(h.shape[-1], (3, 3), name=f"up_{level}_upsample")(h)
                res *= 2

        h = _gn(h.shape[-1], "norm_out", silu=True)(h)
        return nn.Conv(self.out_ch, (3, 3), name="conv_out")(h)
