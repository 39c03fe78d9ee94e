"""Chewie: spatio-temporal cascaded transformer with pooling token mixers.

Counterpart of /root/reference/xdiffusion/score_networks/chewie.py:38-200:
the Flux skeleton (patchify, T5 txt stream, CLIP vec conditioning, 3-axis
RoPE, LastLayer) with the DOUBLE-stream blocks swapped for Chewie's
PoolFormer pooling blocks (layers/chewie.py) — no q/k/v in those blocks.
Single-stream blocks (when depth_single_blocks > 0) remain the standard
Flux attention blocks, exactly as the reference imports them from
layers/flux.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.chewie import ChewieDoubleStreamBlock
from xdiffusion_tpu.layers.embedding import glide_timestep_embedding
from xdiffusion_tpu.layers.flux import (
    LastLayer,
    MLPEmbedder,
    SingleStreamBlock,
    rope_frequencies,
)


class Chewie(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        self._patch_size = int(cfg.patch_size)
        d = int(cfg.hidden_size)
        self._hidden = d
        self._num_heads = int(cfg.num_heads)
        pe_dim = d // self._num_heads
        self._axes_dim = tuple(cfg.axes_dim)
        assert sum(self._axes_dim) == pe_dim, (
            f"axes_dim {self._axes_dim} must sum to head dim {pe_dim}"
        )
        self._theta = float(cfg.get("theta", 10000))
        self._in_channels = int(cfg.in_channels)

        self._img_in = nn.Dense(d, name="img_in")
        self._time_in = MLPEmbedder(hidden_dim=d, name="time_in")
        self._vector_in = MLPEmbedder(hidden_dim=d, name="vector_in")
        self._txt_in = nn.Dense(d, name="txt_in")

        self._double_blocks = [
            ChewieDoubleStreamBlock(
                hidden_size=d,
                num_heads=self._num_heads,
                mlp_ratio=float(cfg.mlp_ratio),
                pool_size=int(cfg.get("pool_size", 3)),
                qkv_bias=bool(cfg.get("qkv_bias", False)),
                name=f"double_{i}",
            )
            for i in range(int(cfg.depth))
        ]
        self._single_blocks = [
            SingleStreamBlock(
                hidden_size=d,
                num_heads=self._num_heads,
                mlp_ratio=float(cfg.mlp_ratio),
                name=f"single_{i}",
            )
            for i in range(int(cfg.depth_single_blocks))
        ]
        self._final = LastLayer(
            hidden_size=d, out_dim=self._in_channels, name="final"
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> jax.Array:
        b, h, w, c = x.shape
        p = self._patch_size
        gh, gw = h // p, w // p

        img = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 5, 2, 4)
        img = img.reshape(b, gh * gw, c * p * p)

        rows = jnp.repeat(jnp.arange(gh), gw)
        cols = jnp.tile(jnp.arange(gw), gh)
        img_ids = jnp.stack(
            [jnp.zeros_like(rows), rows, cols], axis=-1
        ).astype(jnp.float32)
        img_ids = jnp.broadcast_to(img_ids[None], (b, gh * gw, 3))

        txt = context["t5_text_embeddings"]
        y = context["clip_text_embeddings"]
        txt_ids = jnp.zeros((b, txt.shape[1], 3), dtype=jnp.float32)

        timesteps = context["timestep"].astype(jnp.float32)
        img = self._img_in(img)
        # Flux timestep features: cos-first glide sinusoid of 1000*t.
        vec = self._time_in(
            glide_timestep_embedding(timesteps, 256, scale=1000.0)
        )
        vec = vec + self._vector_in(y)
        txt = self._txt_in(txt)

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        cos, sin = rope_frequencies(ids, self._axes_dim, self._theta)

        for block in self._double_blocks:
            img, txt = block(img, txt, vec, cos, sin, deterministic=deterministic)

        merged = jnp.concatenate([txt, img], axis=1)
        for block in self._single_blocks:
            merged = block(merged, vec, cos, sin, deterministic=deterministic)
        img = merged[:, txt.shape[1] :]

        img = self._final(img, vec)
        out = img.reshape(b, gh, gw, c, p, p).transpose(0, 1, 4, 2, 5, 3)
        return out.reshape(b, h, w, c).astype(jnp.float32)
