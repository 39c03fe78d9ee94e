"""HunyuanVideo: MM-DiT double/single stream video transformer.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/hunyuan_video.py:39-726 + layers/hunyuan_video/*
(HunyuanVideo, arXiv:2412.03603): 3D-patchified video latents and refined
text tokens flow through double-stream (separate weights, joint attention)
then single-stream blocks — the Flux block grammar over video tokens with
3-axis RoPE (frame, row, col), qk RMS-norm, and a timestep-conditioned
single-refiner over the text states; conditioning vec = timestep embedding
+ pooled CLIP projection.

Reuses the Flux Double/SingleStreamBlocks (identical math).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import sinusoidal_embedding
from xdiffusion_tpu.layers.flux import (
    DoubleStreamBlock,
    LastLayer,
    MLPEmbedder,
    SingleStreamBlock,
    rope_frequencies,
)


class TokenRefiner(nn.Module):
    """Timestep-conditioned transformer over the raw text states
    (reference: layers/hunyuan_video/token_refiner.py)."""

    hidden_size: int
    num_heads: int = 4
    depth: int = 2

    @nn.compact
    def __call__(self, text_states: jax.Array, temb: jax.Array) -> jax.Array:
        from xdiffusion_tpu.layers.attention import MultiHeadSelfAttention

        d = self.hidden_size
        x = nn.Dense(d, name="proj_in")(text_states)
        c = nn.Dense(d, name="c_proj")(nn.silu(temb))
        for i in range(self.depth):
            gate = nn.Dense(
                2 * d, kernel_init=nn.initializers.zeros, name=f"gate_{i}"
            )(nn.silu(c))
            g1, g2 = jnp.split(gate, 2, axis=-1)
            h = nn.LayerNorm(name=f"norm1_{i}")(x)
            x = x + g1[:, None] * MultiHeadSelfAttention(
                num_heads=self.num_heads, name=f"attn_{i}"
            )(h)
            h = nn.LayerNorm(name=f"norm2_{i}")(x)
            h = nn.Dense(4 * d, name=f"mlp1_{i}")(h)
            h = nn.Dense(d, name=f"mlp2_{i}")(nn.gelu(h, approximate=True))
            x = x + g2[:, None] * h
        return x


class HYVideoDiffusionTransformer(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        d = int(cfg.hidden_size)
        self._dim = d
        self._num_heads = int(cfg.heads_num)
        self._patch = tuple(cfg.patch_size)  # (pt, ph, pw)
        self._rope_dims = tuple(cfg.rope_dim_list)
        assert sum(self._rope_dims) == d // self._num_heads
        self._is_learned_sigma = bool(cfg.get("is_learned_sigma", False))
        self._out_channels = int(cfg.out_channels) * (
            2 if self._is_learned_sigma else 1
        )
        pt, ph, pw = self._patch
        self._token_dim = int(cfg.in_channels) * pt * ph * pw

        self._img_in = nn.Dense(d, name="img_in")
        self._time_in = MLPEmbedder(hidden_dim=d, name="time_in")
        self._vector_in = MLPEmbedder(hidden_dim=d, name="vector_in")
        self._refiner = TokenRefiner(
            hidden_size=d,
            num_heads=max(1, self._num_heads // 2),
            name="txt_refiner",
        )
        mlp_ratio = float(cfg.get("mlp_width_ratio", 4.0))
        self._double_blocks = [
            DoubleStreamBlock(
                hidden_size=d,
                num_heads=self._num_heads,
                mlp_ratio=mlp_ratio,
                qkv_bias=bool(cfg.get("qkv_bias", True)),
                name=f"double_{i}",
            )
            for i in range(int(cfg.mm_double_blocks_depth))
        ]
        self._single_blocks = [
            SingleStreamBlock(
                hidden_size=d,
                num_heads=self._num_heads,
                mlp_ratio=mlp_ratio,
                name=f"single_{i}",
            )
            for i in range(int(cfg.mm_single_blocks_depth))
        ]
        self._final = LastLayer(
            hidden_size=d,
            out_dim=self._patch[0] * self._patch[1] * self._patch[2]
            * self._out_channels,
            name="final",
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, F, H, W, C) latent grid."""
        b, f, hh, ww, c = x.shape
        pt, ph, pw = self._patch
        gf, gh, gw = f // pt, hh // ph, ww // pw

        img = x.reshape(b, gf, pt, gh, ph, gw, pw, c)
        img = img.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        img = img.reshape(b, gf * gh * gw, c * pt * ph * pw)
        img = self._img_in(img)

        fi = jnp.repeat(jnp.arange(gf), gh * gw)
        ri = jnp.tile(jnp.repeat(jnp.arange(gh), gw), gf)
        ci = jnp.tile(jnp.arange(gw), gf * gh)
        img_ids = jnp.stack([fi, ri, ci], axis=-1).astype(jnp.float32)
        img_ids = jnp.broadcast_to(img_ids[None], (b, gf * gh * gw, 3))

        timestep = context["timestep"].astype(jnp.float32)
        vec = self._time_in(sinusoidal_embedding(timestep, 256, max_time=1.0))
        if "clip_text_embeddings" in context:
            vec = vec + self._vector_in(context["clip_text_embeddings"])

        txt = self._refiner(
            context["text_embeddings"], vec
        )  # (B, L, hidden)
        txt_ids = jnp.zeros((b, txt.shape[1], 3), dtype=jnp.float32)

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        cos, sin = rope_frequencies(ids, self._rope_dims, 10000.0)

        for block in self._double_blocks:
            img, txt = block(img, txt, vec, cos, sin, deterministic=deterministic)
        merged = jnp.concatenate([txt, img], axis=1)
        for block in self._single_blocks:
            merged = block(merged, vec, cos, sin, deterministic=deterministic)
        img = merged[:, txt.shape[1] :]

        img = self._final(img, vec)
        oc = self._out_channels
        out = img.reshape(b, gf, gh, gw, pt, ph, pw, oc)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        out = out.reshape(b, f, hh, ww, oc).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
