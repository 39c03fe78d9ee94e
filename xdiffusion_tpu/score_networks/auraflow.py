"""AuraFlow: MMDiT double blocks + single-DiT blocks over joint tokens.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/auraflow.py:18-540 (AuraFlow / "fal" open model family):
learned positional patch embedding, T5 caption projection + learned
register tokens prepended to the text stream, a few MMDiT (dual-stream)
layers, then single-DiT layers over the concatenated [text; image]
sequence; timestep conditioning through adaLN-Zero.

Reuses the SD3 MMDiTBlock for the dual-stream layers (same math).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import (
    PatchEmbed,
    sincos_position_embedding_2d,
    sinusoidal_embedding,
)
from xdiffusion_tpu.layers.attention import MultiHeadSelfAttention
from xdiffusion_tpu.score_networks.sd3 import MMDiTBlock, _modulate


class SingleDiTBlock(nn.Module):
    """adaLN-Zero DiT block over the merged sequence."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, deterministic=True):
        d = self.dim
        mod = nn.Dense(
            6 * d, kernel_init=nn.initializers.zeros, name="mod"
        )(nn.silu(temb))
        s1, sc1, g1, s2, sc2, g2 = jnp.split(mod, 6, axis=-1)
        h = _modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, name="norm1")(x),
            s1, sc1,
        )
        h = MultiHeadSelfAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(h, deterministic=deterministic)
        x = x + g1[:, None] * h
        h = _modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x),
            s2, sc2,
        )
        h = nn.Dense(4 * d, dtype=self.dtype, name="mlp1")(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp2")(
            nn.gelu(h, approximate=True)
        )
        return x + g2[:, None] * h


class AuraFlow(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        self._patch_size = int(cfg.patch_size)
        d = int(cfg.attention_head_dim) * int(cfg.num_attention_heads)
        self._dim = d
        self._num_heads = int(cfg.num_attention_heads)
        self._is_learned_sigma = bool(cfg.get("is_learned_sigma", False))
        self._out_channels = (
            int(cfg.input_channels) * 2
            if self._is_learned_sigma
            else int(cfg.out_channels)
        )
        s = int(cfg.input_spatial_size)
        self._spatial = s
        grid = s // self._patch_size

        self._patch_embed = PatchEmbed(
            patch_size=self._patch_size, embed_dim=d, name="patch_embed"
        )
        self._pos = sincos_position_embedding_2d(d, grid, grid)
        self._context_embedder = nn.Dense(
            d, use_bias=False, name="context_embedder"
        )
        self._t_fc1 = nn.Dense(d, name="t_fc1")
        self._t_fc2 = nn.Dense(d, name="t_fc2")
        self._register_tokens = self.param(
            "register_tokens",
            nn.initializers.normal(stddev=0.02),
            (1, 8, d),
        )
        self._mmdit_blocks = [
            MMDiTBlock(
                dim=d, num_heads=self._num_heads, name=f"mmdit_{i}"
            )
            for i in range(int(cfg.num_mmdit_layers))
        ]
        self._single_blocks = [
            SingleDiTBlock(dim=d, num_heads=self._num_heads, name=f"single_{i}")
            for i in range(int(cfg.num_single_dit_layers))
        ]
        self._final_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, name="final_norm"
        )
        self._final_mod = nn.Dense(
            2 * d, kernel_init=nn.initializers.zeros, name="final_mod"
        )
        self._final_proj = nn.Dense(
            self._patch_size**2 * self._out_channels,
            kernel_init=nn.initializers.zeros,
            name="final_proj",
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        timestep = context["timestep"].astype(jnp.float32)
        captions = context["t5_text_embeddings"]

        b, h, w, c = x.shape
        tokens = self._patch_embed(x) + self._pos[None]
        temb = self._t_fc2(
            nn.silu(self._t_fc1(sinusoidal_embedding(timestep, 256, max_time=1.0)))
        )
        ctx = self._context_embedder(captions)
        ctx = jnp.concatenate(
            [jnp.broadcast_to(self._register_tokens, (b, 8, self._dim)), ctx],
            axis=1,
        )

        for block in self._mmdit_blocks:
            tokens, ctx = block(tokens, ctx, temb, deterministic=deterministic)

        merged = jnp.concatenate([ctx, tokens], axis=1)
        for block in self._single_blocks:
            merged = block(merged, temb, deterministic=deterministic)
        tokens = merged[:, ctx.shape[1] :]

        shift, scale = jnp.split(self._final_mod(nn.silu(temb)), 2, axis=-1)
        tokens = _modulate(self._final_norm(tokens), shift, scale)
        tokens = self._final_proj(tokens)

        p = self._patch_size
        gh = gw = self._spatial // p
        oc = self._out_channels
        out = tokens.reshape(b, gh, gw, p, p, oc)
        out = jnp.einsum("bhwpqc->bhpwqc", out).reshape(
            b, gh * p, gw * p, oc
        ).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
