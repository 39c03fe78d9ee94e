"""AuraFlow: MMDiT joint blocks + single-DiT blocks over joint tokens.

Faithful counterpart of /root/reference/xdiffusion/
score_networks/auraflow.py:18-524 (AuraFlow / fal's open model, built on
the public diffusers auraflow_transformer_2d). Distinctives vs SD3-style
MMDiT, all matched exactly:

- Bias-free everywhere: attention q/k/v/out, context embedder, adaLN
  linears, pre-final modulation, output projection.
- Per-head affine-free FP32 LayerNorm qk-norm in every attention (both
  streams), applied BEFORE the text/image concat (text-first concat).
- SwiGLU feed-forward (AuraFlowFeedForward): silu(lin1(x)) * lin2(x) ->
  out_projection with hidden = find_multiple(2*(4d)/3, 256).
- Sandwich block residuals: x = residual + gate_mlp * ff(modulate(
  norm2(residual + gate_msa * attn))) — norm2 wraps the post-attention
  SUM, and the final residual is the pre-attention input.
- Learned positional patch embedding: Linear over channel-first (c,p,p)
  patch features + a learned (1, pos_embed_max_size, d) table center-
  cropped to the token grid.
- Pre-final block emits (scale, shift) in THAT order from a bias-free
  linear on silu(temb).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import glide_timestep_embedding
from xdiffusion_tpu.ops import dot_product_attention


def _fp32_ln(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Affine-free LayerNorm computed in fp32 (reference FP32LayerNorm)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


class AuraFlowFeedForward(nn.Module):
    """SwiGLU MLP (reference auraflow.py:407-423): bias-free
    silu(linear_1(x)) * linear_2(x) -> out_projection."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = _find_multiple(int(2 * (4 * self.dim) / 3), 256)
        a = nn.Dense(hidden, use_bias=False, name="linear_1")(x)
        b = nn.Dense(hidden, use_bias=False, name="linear_2")(x)
        return nn.Dense(self.dim, use_bias=False, name="out_projection")(
            nn.silu(a) * b
        )


def _ada_zero(temb: jax.Array, d: int, name: str):
    """AdaLayerNormZero's 6-way modulation linear (bias=False flavor)."""
    mod = nn.Dense(d * 6, use_bias=False, name=name)(nn.silu(temb))
    return jnp.split(mod, 6, axis=-1)


def _qk_heads(t: jax.Array, heads: int):
    b, n, c = t.shape
    return t.reshape(b, n, heads, c // heads)


class AuraFlowJointBlock(nn.Module):
    """MMDiT-style joint block with AuraFlow's quirks
    (reference auraflow.py:295-380)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, c, temb, deterministic=True):
        d = self.dim
        b, n, _ = x.shape
        l = c.shape[1]
        hd = d // self.num_heads
        scale = hd**-0.5

        sx, scx, gx, sx2, scx2, gx2 = _ada_zero(temb, d, "mod_x")
        sc_, scc, gc, sc2, scc2, gc2 = _ada_zero(temb, d, "mod_c")

        hx = _fp32_ln(x) * (1 + scx[:, None]) + sx[:, None]
        hc = _fp32_ln(c) * (1 + scc[:, None]) + sc_[:, None]

        qkv_x = nn.Dense(3 * d, use_bias=False, name="qkv_x")(hx)
        qkv_c = nn.Dense(3 * d, use_bias=False, name="qkv_c")(hc)
        qx, kx, vx = (_qk_heads(t, self.num_heads)
                      for t in jnp.split(qkv_x, 3, axis=-1))
        qc, kc, vc = (_qk_heads(t, self.num_heads)
                      for t in jnp.split(qkv_c, 3, axis=-1))
        # Per-head affine-free fp32 LN on q/k BEFORE the concat.
        qx, kx = _fp32_ln(qx), _fp32_ln(kx)
        qc, kc = _fp32_ln(qc), _fp32_ln(kc)

        to_bhsd = lambda t: t.transpose(0, 2, 1, 3)
        q = to_bhsd(jnp.concatenate([qc, qx], axis=1))
        k = to_bhsd(jnp.concatenate([kc, kx], axis=1))
        v = to_bhsd(jnp.concatenate([vc, vx], axis=1))
        out = dot_product_attention(q, k, v, scale=scale)
        out = out.transpose(0, 2, 1, 3).reshape(b, l + n, d)
        out_c, out_x = out[:, :l], out[:, l:]
        out_x = nn.Dense(d, use_bias=False, name="proj_x")(out_x)
        out_c = nn.Dense(d, use_bias=False, name="proj_c")(out_c)

        # Sandwich residual: norm2 wraps the post-attention sum; the FF
        # residual is the PRE-attention input.
        hx = _fp32_ln(x + gx[:, None] * out_x)
        hx = hx * (1 + scx2[:, None]) + sx2[:, None]
        x = x + gx2[:, None] * AuraFlowFeedForward(dim=d, name="ff_x")(hx)

        hc = _fp32_ln(c + gc[:, None] * out_c)
        hc = hc * (1 + scc2[:, None]) + sc2[:, None]
        c = c + gc2[:, None] * AuraFlowFeedForward(dim=d, name="ff_c")(hc)
        return x, c


class AuraFlowSingleBlock(nn.Module):
    """Single-DiT variant (reference auraflow.py:250-292)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, temb, deterministic=True):
        d = self.dim
        b, n, _ = x.shape
        hd = d // self.num_heads

        s1, sc1, g1, s2, sc2, g2 = _ada_zero(temb, d, "mod")
        h = _fp32_ln(x) * (1 + sc1[:, None]) + s1[:, None]
        qkv = nn.Dense(3 * d, use_bias=False, name="qkv")(h)
        q, k, v = (_qk_heads(t, self.num_heads)
                   for t in jnp.split(qkv, 3, axis=-1))
        q, k = _fp32_ln(q), _fp32_ln(k)
        out = dot_product_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            scale=hd**-0.5,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = nn.Dense(d, use_bias=False, name="proj")(out)

        h = _fp32_ln(x + g1[:, None] * out)
        h = h * (1 + sc2[:, None]) + s2[:, None]
        return x + g2[:, None] * AuraFlowFeedForward(dim=d, name="ff")(h)


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
        self._pos_embed_max_size = int(cfg.get("pos_embed_max_size", 1024))

        # AuraFlowPatchEmbed: Linear over channel-first patch features +
        # a learned positional table center-cropped to the token grid.
        self._patch_proj = nn.Dense(d, name="patch_proj")
        self._pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.1),
            (1, self._pos_embed_max_size, d),
        )
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
            AuraFlowJointBlock(
                dim=d, num_heads=self._num_heads, name=f"mmdit_{i}"
            )
            for i in range(int(cfg.num_mmdit_layers))
        ]
        self._single_blocks = [
            AuraFlowSingleBlock(
                dim=d, num_heads=self._num_heads, name=f"single_{i}"
            )
            for i in range(int(cfg.num_single_dit_layers))
        ]
        # AuraFlowPreFinalBlock: bias-free linear on silu(temb), chunk
        # order (scale, shift) (reference auraflow.py:383-398).
        self._final_mod = nn.Dense(
            2 * d, use_bias=False, name="final_mod"
        )
        self._final_proj = nn.Dense(
            self._patch_size**2 * self._out_channels,
            use_bias=False,
            name="final_proj",
        )

    def _pe_selection(self, gh: int, gw: int):
        h_max = int(math.isqrt(self._pos_embed_max_size))
        starth = h_max // 2 - gh // 2
        startw = h_max // 2 - gw // 2
        idx = (
            jnp.arange(self._pos_embed_max_size).reshape(h_max, h_max)[
                starth : starth + gh, startw : startw + gw
            ]
        ).reshape(-1)
        return idx

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        timestep = context["timestep"].astype(jnp.float32)
        captions = context["t5_text_embeddings"]

        b, h, w, c = x.shape
        p = self._patch_size
        gh, gw = h // p, w // p
        # Channel-first patch features (B, C, gh, p, gw, p) ->
        # (B, gh, gw, C, p, p) -> (B, N, C*p*p), like the reference.
        tokens = x.transpose(0, 3, 1, 2).reshape(b, c, gh, p, gw, p)
        tokens = tokens.transpose(0, 2, 4, 1, 3, 5).reshape(
            b, gh * gw, c * p * p
        )
        tokens = self._patch_proj(tokens)
        tokens = tokens + self._pos_embed[:, self._pe_selection(gh, gw)]

        # Timesteps(256, scale=1000, flip_sin_to_cos) -> TimestepEmbedding.
        temb = self._t_fc2(
            nn.silu(
                self._t_fc1(glide_timestep_embedding(timestep, 256, scale=1000.0))
            )
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

        # AuraFlowPreFinalBlock applies modulation WITHOUT a norm.
        scale, shift = jnp.split(self._final_mod(nn.silu(temb)), 2, axis=-1)
        tokens = tokens * (1 + scale[:, None]) + shift[:, None]
        tokens = self._final_proj(tokens)

        oc = self._out_channels
        out = tokens.reshape(b, gh, gw, p, p, oc)
        out = jnp.einsum("bhwpqc->bhpwqc", out).reshape(
            b, gh * p, gw * p, oc
        ).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
