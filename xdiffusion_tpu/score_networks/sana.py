"""Sana: linear-attention diffusion transformer.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/sana.py:11-599 ("SANA: Efficient High-Resolution Image
Synthesis with Linear Diffusion Transformers", arXiv:2410.10629):
ReLU linear attention (O(N) in sequence length: out = q(k^T v) / q(k^T 1)),
softmax cross-attention over caption embeddings, and the GLUMBConv
(gated mobile-inverted conv) Mix-FFN over the 2D token grid; adaLN-single
conditioning like PixArt.

TPU note: linear attention is two small matmuls per head — ideal MXU work
with no softmax bottleneck; fp32 accumulation guards the normalizer.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import (
    DiTTimestepEmbedding,
    PatchEmbed,
)
from xdiffusion_tpu.layers.norm import RMSNorm
from xdiffusion_tpu.ops import dot_product_attention


def relu_linear_attention(q, k, v, eps: float = 1e-15):
    """q,k,v: (B, H, N, D). out = q (k^T v) / (q (k^T 1))."""
    q = jax.nn.relu(q).astype(jnp.float32)
    k = jax.nn.relu(k).astype(jnp.float32)
    v = v.astype(jnp.float32)
    kv = jnp.einsum("bhnd,bhne->bhde", k, v)
    z = jnp.einsum("bhnd,bhd->bhn", q, k.sum(axis=2))
    out = jnp.einsum("bhnd,bhde->bhne", q, kv)
    return out / (z[..., None] + eps)


class GLUMBConv(nn.Module):
    """Gated mobile-inverted conv Mix-FFN (reference: sana.py:11-70).
    Operates on the (B, H, W, C) token grid."""

    out_channels: int
    expand_ratio: float = 2.5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        hidden = int(self.expand_ratio * c_in)
        h = nn.Conv(2 * hidden, (1, 1), name="conv_inverted")(x)
        h = nn.silu(h)
        h = nn.Conv(
            2 * hidden,
            (3, 3),
            feature_group_count=2 * hidden,
            name="conv_depth",
        )(h)
        gate_in, gate = jnp.split(h, 2, axis=-1)
        h = gate_in * nn.silu(gate)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="conv_point")(h)
        return h


class SanaTransformerBlock(nn.Module):
    """Linear self-attn + softmax cross-attn + GLUMBConv
    (reference: sana.py:115-220)."""

    dim: int
    num_attention_heads: int
    num_cross_attention_heads: int
    mlp_ratio: float = 2.5
    grid: Tuple[int, int] = (4, 4)

    @nn.compact
    def __call__(self, x, y, shared_mod, deterministic=True):
        d = self.dim
        b, n, _ = x.shape
        block_table = self.param(
            "scale_shift_table",
            lambda key: jax.random.normal(key, (6, d)) / d**0.5,
        )
        mod = shared_mod + block_table[None]
        s1, sc1, g1, s2, sc2, g2 = (mod[:, i] for i in range(6))

        # Linear self-attention.
        hd = d // self.num_attention_heads
        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm1")(x)
        h = h * (1 + sc1[:, None]) + s1[:, None]
        # Reference hardcodes attention_bias=False for the linear
        # self-attention's to_q/k/v (sana.py:246).
        qkv = nn.Dense(3 * d, use_bias=False, name="qkv")(h)
        q, k, v = (
            t.reshape(b, n, self.num_attention_heads, hd).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        attn = relu_linear_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d).astype(x.dtype)
        x = x + g1[:, None] * nn.Dense(d, name="attn_proj")(attn)

        # Softmax cross attention over captions.
        chd = d // self.num_cross_attention_heads
        q = nn.Dense(d, name="cross_q")(x)
        kv = nn.Dense(2 * d, name="cross_kv")(y)
        ck, cv = jnp.split(kv, 2, axis=-1)
        to_heads = lambda t, l: t.reshape(
            b, l, self.num_cross_attention_heads, chd
        ).transpose(0, 2, 1, 3)
        cross = dot_product_attention(
            to_heads(q, n), to_heads(ck, y.shape[1]), to_heads(cv, y.shape[1])
        )
        cross = cross.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, name="cross_proj")(cross)

        # GLUMBConv Mix-FFN over the 2D grid.
        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x)
        h = h * (1 + sc2[:, None]) + s2[:, None]
        gh, gw = self.grid
        h2d = h.reshape(b, gh, gw, d)
        h2d = GLUMBConv(
            out_channels=d, expand_ratio=self.mlp_ratio, name="mix_ffn"
        )(h2d)
        return x + g2[:, None] * h2d.reshape(b, n, d)


class SanaScoreNetwork(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        self._patch_size = int(cfg.patch_size)
        d = int(cfg.attention_head_dim) * int(cfg.num_attention_heads)
        self._dim = d
        self._is_learned_sigma = bool(cfg.get("is_learned_sigma", False))
        self._out_channels = (
            int(cfg.in_channels) * 2
            if self._is_learned_sigma
            else int(cfg.out_channels)
        )
        s = cfg.input_spatial_size
        self._spatial = [s, s] if not isinstance(s, list) else list(s)
        grid = (
            self._spatial[0] // self._patch_size,
            self._spatial[1] // self._patch_size,
        )
        self._grid = grid

        # Reference PatchEmbed has pos_embed_type=None - NO positional
        # embedding anywhere in Sana (sana.py:253-261); position information
        # comes from the Mix-FFN's depthwise conv over the 2D grid.
        self._patch_embed = PatchEmbed(
            patch_size=self._patch_size, embed_dim=d, name="patch_embed"
        )
        self._t_embed = DiTTimestepEmbedding(hidden_size=d, name="t_embed")
        self._t_block = nn.Dense(6 * d, name="t_block")
        # PixArtAlphaTextProjection: linear_1 -> tanh-gelu -> linear_2
        # (reference embedding.py:676-705).
        self._caption_fc1 = nn.Dense(d, name="caption_fc1")
        self._caption_fc2 = nn.Dense(d, name="caption_fc2")
        self._caption_norm = RMSNorm(dim=d, eps=1e-5, name="caption_norm")
        self._blocks = [
            SanaTransformerBlock(
                dim=d,
                num_attention_heads=int(cfg.num_attention_heads),
                num_cross_attention_heads=int(cfg.num_cross_attention_heads),
                mlp_ratio=float(cfg.mlp_ratio),
                grid=grid,
                name=f"block_{i}",
            )
            for i in range(int(cfg.num_layers))
        ]
        self._final_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, name="final_norm"
        )
        # Final scale_shift_table + raw embedded-timestep modulation
        # (reference sana.py:296-361).
        self._final_table = self.param(
            "final_scale_shift_table",
            lambda key: jax.random.normal(key, (2, d)) / d**0.5,
        )
        self._final_proj = nn.Dense(
            self._patch_size**2 * self._out_channels,
            kernel_init=nn.initializers.zeros,
            name="final_proj",
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        timestep = context["timestep"]
        captions = context["text_embeddings"]  # (B, L, caption_channels)

        b, h, w, c = x.shape
        tokens = self._patch_embed(x)
        t_emb = self._t_embed(timestep)
        shared_mod = self._t_block(nn.silu(t_emb)).reshape(b, 6, self._dim)
        y = self._caption_fc2(
            nn.gelu(self._caption_fc1(captions), approximate=True)
        )
        y = self._caption_norm(y)

        for block in self._blocks:
            tokens = block(tokens, y, shared_mod, deterministic=deterministic)

        fmod = self._final_table[None] + t_emb[:, None]  # (B, 2, D)
        shift, scale = fmod[:, 0], fmod[:, 1]
        tokens = self._final_norm(tokens)
        tokens = tokens * (1 + scale[:, None]) + shift[:, None]
        tokens = self._final_proj(tokens)
        p = self._patch_size
        gh, gw = self._grid
        oc = self._out_channels
        out = tokens.reshape(b, gh, gw, p, p, oc)
        out = jnp.einsum("bhwpqc->bhpwqc", out).reshape(
            b, gh * p, gw * p, oc
        ).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
