"""Sora (OpenSora STDiT3): spatial-temporal DiT for video.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/sora.py:26-465 (OpenSora's STDiT3): 3D patchify
(pt, ph, pw) -> per-block pairs of [spatial attention within each frame,
temporal attention across frames], each with adaLN-Zero modulation from
the timestep embedding, T5 caption cross-attention in every block, and
rectified-flow prediction. qk-norm (RMS) on attention queries/keys.

TPU note: spatial and temporal attentions are pure reshapes between
(B*F, N, D) and (B*N, F, D) token layouts — no data movement beyond the
relayout XLA already fuses.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import (
    sincos_position_embedding_2d,
    sinusoidal_embedding,
)
from xdiffusion_tpu.layers.norm import RMSNorm
from xdiffusion_tpu.ops import dot_product_attention


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None]) + shift[:, None]


class STAttention(nn.Module):
    """Self attention with optional qk RMS-norm."""

    num_heads: int
    qk_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, name="qkv")(x)
        q, k, v = (
            t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        if self.qk_norm:
            q = RMSNorm(dim=hd, name="q_norm")(q)
            k = RMSNorm(dim=hd, name="k_norm")(k)
        out = dot_product_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class CaptionCrossAttention(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        b, n, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, name="q")(x)
        kv = nn.Dense(2 * c, name="kv")(y)
        k, v = jnp.split(kv, 2, axis=-1)
        to_heads = lambda t, l: t.reshape(b, l, self.num_heads, hd).transpose(
            0, 2, 1, 3
        )
        out = dot_product_attention(
            to_heads(q, n), to_heads(k, y.shape[1]), to_heads(v, y.shape[1])
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class STDiTBlock(nn.Module):
    """One spatial-or-temporal DiT block with caption cross attention
    (reference: sora.py:26-180)."""

    hidden_size: int
    num_heads: int
    temporal: bool = False
    mlp_ratio: float = 4.0
    qk_norm: bool = True

    @nn.compact
    def __call__(self, x, y, temb, num_frames: int, deterministic=True):
        # x: (B, F*N, D) flattened spatio-temporal tokens.
        b, fn, d = x.shape
        f = num_frames
        n = fn // f
        mod = nn.Dense(
            6 * d, kernel_init=nn.initializers.zeros, name="mod"
        )(nn.silu(temb))
        s1, sc1, g1, s2, sc2, g2 = jnp.split(mod, 6, axis=-1)

        h = _modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, name="norm1")(x),
            s1, sc1,
        )
        if self.temporal:
            # (B, F, N, D) -> (B*N, F, D): frames attend at each location.
            h = h.reshape(b, f, n, d).transpose(0, 2, 1, 3).reshape(b * n, f, d)
            h = STAttention(
                num_heads=self.num_heads, qk_norm=self.qk_norm, name="attn"
            )(h)
            h = h.reshape(b, n, f, d).transpose(0, 2, 1, 3).reshape(b, fn, d)
        else:
            # (B*F, N, D): spatial attention within each frame.
            h = h.reshape(b * f, n, d)
            h = STAttention(
                num_heads=self.num_heads, qk_norm=self.qk_norm, name="attn"
            )(h)
            h = h.reshape(b, fn, d)
        x = x + g1[:, None] * h

        # Caption cross attention (every block).
        x = x + CaptionCrossAttention(
            num_heads=self.num_heads, name="cross_attn"
        )(x, y)

        h = _modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x),
            s2, sc2,
        )
        h = nn.Dense(int(d * self.mlp_ratio), name="mlp1")(h)
        h = nn.Dense(d, name="mlp2")(nn.gelu(h, approximate=True))
        return x + g2[:, None] * h


class Sora(nn.Module):
    """Instantiated with the score_network params block as a DotConfig."""

    config: Any

    def setup(self):
        cfg = self.config
        self._patch = tuple(cfg.patch_size)  # (pt, ph, pw)
        d = int(cfg.hidden_size)
        self._dim = d
        self._num_heads = int(cfg.num_heads)
        self._is_learned_sigma = bool(cfg.get("pred_sigma", False))
        self._in_channels = int(cfg.input_channels)
        self._out_channels = self._in_channels * (
            2 if self._is_learned_sigma else 1
        )
        size = list(cfg.input_size)  # (F, H, W)
        self._input_size = size
        pt, ph, pw = self._patch
        self._grid = (size[0] // pt, size[1] // ph, size[2] // pw)

        self._x_embedder = nn.Dense(d, name="x_embedder")
        self._pos_spatial = sincos_position_embedding_2d(
            d, self._grid[1], self._grid[2]
        )
        self._t_fc1 = nn.Dense(d, name="t_fc1")
        self._t_fc2 = nn.Dense(d, name="t_fc2")
        self._y_embedder = nn.Dense(d, name="y_embedder")

        blocks = []
        for i in range(int(cfg.depth)):
            blocks.append(
                STDiTBlock(
                    hidden_size=d,
                    num_heads=self._num_heads,
                    temporal=(i % 2 == 1),
                    mlp_ratio=float(cfg.mlp_ratio),
                    qk_norm=bool(cfg.get("qk_norm", True)),
                    name=f"block_{i}",
                )
            )
        self._blocks = blocks
        self._final_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, name="final_norm"
        )
        self._final_mod = nn.Dense(
            2 * d, kernel_init=nn.initializers.zeros, name="final_mod"
        )
        pt, ph, pw = self._patch
        self._final_proj = nn.Dense(
            pt * ph * pw * self._out_channels,
            kernel_init=nn.initializers.zeros,
            name="final_proj",
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, F, H, W, C)."""
        b, f, hh, ww, c = x.shape
        pt, ph, pw = self._patch
        gf, gh, gw = f // pt, hh // ph, ww // pw

        # 3D patchify -> (B, gf*gh*gw, C*pt*ph*pw).
        tokens = x.reshape(b, gf, pt, gh, ph, gw, pw, c)
        tokens = tokens.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        tokens = tokens.reshape(b, gf * gh * gw, c * pt * ph * pw)
        tokens = self._x_embedder(tokens)
        # Spatial positional encoding tiled over frames.
        pos = jnp.tile(self._pos_spatial, (gf, 1))
        tokens = tokens + pos[None]

        timestep = context["timestep"].astype(jnp.float32)
        temb = self._t_fc2(
            nn.silu(self._t_fc1(sinusoidal_embedding(timestep, 256, max_time=1.0)))
        )
        y = self._y_embedder(context["text_embeddings"])

        for block in self._blocks:
            tokens = block(tokens, y, temb, gf, deterministic=deterministic)

        shift, scale = jnp.split(self._final_mod(nn.silu(temb)), 2, axis=-1)
        tokens = _modulate(self._final_norm(tokens), shift, scale)
        tokens = self._final_proj(tokens)

        oc = self._out_channels
        out = tokens.reshape(b, gf, gh, gw, pt, ph, pw, oc)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        out = out.reshape(b, f, hh, ww, oc).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
