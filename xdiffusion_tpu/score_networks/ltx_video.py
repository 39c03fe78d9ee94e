"""LTX-Video transformer (latent-space video DiT).

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/ltx_video.py:56-524 + layers/ltx.py (LTX-Video,
arXiv:2501.00103): operates on the causal-VAE latent grid (F, H, W, C)
flattened to tokens, with 3-axis RoPE over (frame, row, col) positions,
per-block [self-attention, caption cross-attention, feed-forward] and
adaLN-single timestep modulation (shared MLP + per-block offsets, like
PixArt). Rectified-flow prediction.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import sinusoidal_embedding
from xdiffusion_tpu.layers.flux import rope_frequencies
from xdiffusion_tpu.layers.norm import RMSNorm
from xdiffusion_tpu.ops import dot_product_attention


class LTXBlock(nn.Module):
    """Self-attn (RoPE, qk-norm) + caption cross-attn + FF with
    adaLN-single modulation (reference: layers/ltx.py BasicTransformerBlock).
    """

    dim: int
    num_heads: int
    attention_bias: bool = True

    @nn.compact
    def __call__(self, x, y, shared_mod, cos, sin, deterministic=True):
        from xdiffusion_tpu.layers.flux import apply_rope

        d = self.dim
        b, n, _ = x.shape
        hd = d // self.num_heads
        block_table = self.param(
            "scale_shift_table",
            lambda key: jax.random.normal(key, (6, d)) / d**0.5,
        )
        mod = shared_mod + block_table[None]
        s1, sc1, g1, s2, sc2, g2 = (mod[:, i] for i in range(6))

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm1")(x)
        h = h * (1 + sc1[:, None]) + s1[:, None]
        qkv = nn.Dense(3 * d, use_bias=self.attention_bias, name="qkv")(h)
        q, k, v = (
            t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        q = RMSNorm(dim=hd, name="q_norm")(q)
        k = RMSNorm(dim=hd, name="k_norm")(k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + g1[:, None] * nn.Dense(d, name="attn_proj")(attn)

        # Caption cross attention (no RoPE on text).
        cq = nn.Dense(d, name="cross_q")(x)
        ckv = nn.Dense(2 * d, name="cross_kv")(y)
        ck, cv = jnp.split(ckv, 2, axis=-1)
        to_heads = lambda t, l: t.reshape(b, l, self.num_heads, hd).transpose(
            0, 2, 1, 3
        )
        cross = dot_product_attention(
            to_heads(cq, n), to_heads(ck, y.shape[1]), to_heads(cv, y.shape[1])
        )
        cross = cross.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, name="cross_proj")(cross)

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x)
        h = h * (1 + sc2[:, None]) + s2[:, None]
        h = nn.Dense(4 * d, name="ff1")(h)
        h = nn.Dense(d, name="ff2")(nn.gelu(h, approximate=True))
        return x + g2[:, None] * h


class LTXVideoTransformer(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        d = int(cfg.attention_head_dim) * int(cfg.num_attention_heads)
        self._dim = d
        self._num_heads = int(cfg.num_attention_heads)
        self._is_learned_sigma = bool(cfg.get("is_learned_sigma", False))
        self._out_channels = int(cfg.out_channels) * (
            2 if self._is_learned_sigma else 1
        )
        hd = d // self._num_heads
        # 3-axis RoPE dims over (frame, row, col); must sum to head dim.
        base = hd // 4
        self._axes_dim = (hd - 2 * base - (hd - 3 * base) + base, base, base)
        # simpler: split head dim ~ (hd - 2*base, base, base)
        self._axes_dim = (hd - 2 * base, base, base)

        self._proj_in = nn.Dense(d, name="proj_in")
        self._caption_projection = nn.Dense(d, name="caption_projection")
        self._t_block = nn.Dense(6 * d, name="t_block")
        self._t_fc1 = nn.Dense(d, name="t_fc1")
        self._t_fc2 = nn.Dense(d, name="t_fc2")
        self._blocks = [
            LTXBlock(
                dim=d,
                num_heads=self._num_heads,
                attention_bias=bool(cfg.get("attention_bias", True)),
                name=f"block_{i}",
            )
            for i in range(int(cfg.num_layers))
        ]
        self._final_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, name="final_norm"
        )
        # Reference: learned (2, D) scale_shift_table added to the raw temb
        # (ltx_video.py:134-137), not a per-model Dense.
        self._final_table = self.param(
            "scale_shift_table",
            lambda key: jax.random.normal(key, (2, d)) / d**0.5,
        )
        self._proj_out = nn.Dense(
            self._out_channels,
            kernel_init=nn.initializers.zeros,
            name="proj_out",
        )
        # timestep_scale_multiplier (reference :360-361): LTX times are
        # continuous in [0,1]; the multiplier maps them onto the discrete
        # embedding frequency band.
        self._t_scale = float(cfg.get("timestep_scale_multiplier", 1000))

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, F, H, W, C) latent grid."""
        b, f, h, w, c = x.shape
        tokens = self._proj_in(x.reshape(b, f * h * w, c))

        # 3-axis rope ids (frame, row, col).
        fi = jnp.repeat(jnp.arange(f), h * w)
        ri = jnp.tile(jnp.repeat(jnp.arange(h), w), f)
        ci = jnp.tile(jnp.arange(w), f * h)
        ids = jnp.stack([fi, ri, ci], axis=-1).astype(jnp.float32)
        ids = jnp.broadcast_to(ids[None], (b, f * h * w, 3))
        cos, sin = rope_frequencies(ids, self._axes_dim, 10000.0)

        timestep = context["timestep"].astype(jnp.float32) * self._t_scale
        temb = self._t_fc2(
            nn.silu(self._t_fc1(sinusoidal_embedding(timestep, 256, max_time=1000.0)))
        )
        shared_mod = self._t_block(nn.silu(temb)).reshape(b, 6, self._dim)
        y = self._caption_projection(context["text_embeddings"])

        for block in self._blocks:
            tokens = block(
                tokens, y, shared_mod, cos, sin, deterministic=deterministic
            )

        final_mod = self._final_table[None] + temb[:, None]  # (B, 2, D)
        shift, scale = final_mod[:, 0], final_mod[:, 1]
        tokens = self._final_norm(tokens)
        tokens = tokens * (1 + scale[:, None]) + shift[:, None]
        out = self._proj_out(tokens).reshape(
            b, f, h, w, self._out_channels
        ).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
