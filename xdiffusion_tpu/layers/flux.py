"""Flux building blocks: multi-axis RoPE, QK-norm attention, double/single
stream transformer blocks.

Counterpart of /root/reference/xdiffusion/layers/flux.py:23-330 (Flux flow
transformer). Rotary embeddings are precomputed per-position as cos/sin
tables from 3-axis ids and applied inside attention; Q/K are RMS-normed
before the dot product (qk-norm). Double blocks keep separate image/text
streams joined by one attention; single blocks fuse attention and MLP in
parallel over the merged sequence.

norm_cls selects LayerNorm-free DyT variants (flux_dyt) at construction.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.norm import DynamicTanhNorm, RMSNorm


def rope_frequencies(ids: jax.Array, axes_dim: Sequence[int], theta: float):
    """ids: (B, L, n_axes) -> cos/sin tables (B, L, sum(axes_dim)//2).

    Each axis contributes axes_dim[i]//2 rotary frequency pairs.
    """
    cos_parts, sin_parts = [], []
    for i, dim in enumerate(axes_dim):
        half = dim // 2
        freqs = 1.0 / (
            theta ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / dim)
        )
        angles = ids[..., i : i + 1].astype(jnp.float32) * freqs[None, None, :]
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, H, L, D); cos/sin: (B, L, D//2). Pairwise rotation."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[:, None]
    s = sin[:, None]
    out1 = x1 * c - x2 * s
    out2 = x1 * s + x2 * c
    return jnp.stack([out1, out2], axis=-1).reshape(x.shape)


def rope_attention(q, k, v, cos, sin):
    from xdiffusion_tpu.ops import dot_product_attention

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return dot_product_attention(q, k, v)


class MLPEmbedder(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, name="in_layer")(x)
        return nn.Dense(self.hidden_dim, name="out_layer")(nn.silu(x))


def _norm(norm_cls: str, dim: int, name: str):
    if norm_cls == "dyt":
        return DynamicTanhNorm(dim=dim, name=name)
    return nn.LayerNorm(use_bias=False, use_scale=False, name=name)


def _qk_norm(norm_cls: str, dim: int, name: str):
    """Per-head query/key norm: RMSNorm in vanilla Flux, DyT in flux_dyt
    (reference layers/flux.py:100-101 vs layers/flux_dyt.py:100-101)."""
    if norm_cls == "dyt":
        return DynamicTanhNorm(dim=dim, name=name)
    return RMSNorm(dim=dim, name=name)


class Modulation(nn.Module):
    dim: int
    double: bool

    @nn.compact
    def __call__(self, vec: jax.Array):
        mult = 6 if self.double else 3
        out = nn.Dense(
            mult * self.dim, kernel_init=nn.initializers.zeros, name="lin"
        )(nn.silu(vec))
        return jnp.split(out, mult, axis=-1)


class DoubleStreamBlock(nn.Module):
    """Separate img/txt streams, one joint RoPE attention
    (reference: layers/flux.py:153-253)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    norm_cls: str = "layernorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, txt, vec, cos, sin, deterministic=True):
        d = self.hidden_size
        hd = d // self.num_heads
        b, n_img, _ = img.shape
        n_txt = txt.shape[1]

        im1, is1, ig1, im2, is2, ig2 = Modulation(
            dim=d, double=True, name="img_mod"
        )(vec)
        tm1, ts1, tg1, tm2, ts2, tg2 = Modulation(
            dim=d, double=True, name="txt_mod"
        )(vec)

        def heads(t, l):
            return t.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)

        img_n = _norm(self.norm_cls, d, "img_norm1")(img)
        img_n = img_n * (1 + is1[:, None]) + im1[:, None]
        img_qkv = nn.Dense(
            3 * d, use_bias=self.qkv_bias, dtype=self.dtype, name="img_qkv"
        )(img_n)
        iq, ik, iv = (heads(t, n_img) for t in jnp.split(img_qkv, 3, axis=-1))
        iq = _qk_norm(self.norm_cls, hd, "img_q_norm")(iq)
        ik = _qk_norm(self.norm_cls, hd, "img_k_norm")(ik)

        txt_n = _norm(self.norm_cls, d, "txt_norm1")(txt)
        txt_n = txt_n * (1 + ts1[:, None]) + tm1[:, None]
        txt_qkv = nn.Dense(
            3 * d, use_bias=self.qkv_bias, dtype=self.dtype, name="txt_qkv"
        )(txt_n)
        tq, tk, tv = (heads(t, n_txt) for t in jnp.split(txt_qkv, 3, axis=-1))
        tq = _qk_norm(self.norm_cls, hd, "txt_q_norm")(tq)
        tk = _qk_norm(self.norm_cls, hd, "txt_k_norm")(tk)

        q = jnp.concatenate([tq, iq], axis=2)
        k = jnp.concatenate([tk, ik], axis=2)
        v = jnp.concatenate([tv, iv], axis=2)
        attn = rope_attention(q, k, v, cos, sin)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n_txt + n_img, d)
        txt_attn, img_attn = attn[:, :n_txt], attn[:, n_txt:]

        img = img + ig1[:, None] * nn.Dense(
            d, dtype=self.dtype, name="img_proj"
        )(img_attn)
        img_n2 = _norm(self.norm_cls, d, "img_norm2")(img)
        img_n2 = img_n2 * (1 + is2[:, None]) + im2[:, None]
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="img_mlp1")(
            img_n2
        )
        h = nn.Dense(d, dtype=self.dtype, name="img_mlp2")(
            nn.gelu(h, approximate=True)
        )
        img = img + ig2[:, None] * h

        txt = txt + tg1[:, None] * nn.Dense(
            d, dtype=self.dtype, name="txt_proj"
        )(txt_attn)
        txt_n2 = _norm(self.norm_cls, d, "txt_norm2")(txt)
        txt_n2 = txt_n2 * (1 + ts2[:, None]) + tm2[:, None]
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="txt_mlp1")(
            txt_n2
        )
        h = nn.Dense(d, dtype=self.dtype, name="txt_mlp2")(
            nn.gelu(h, approximate=True)
        )
        txt = txt + tg2[:, None] * h
        return img, txt


class SingleStreamBlock(nn.Module):
    """Merged-stream block: attention and MLP computed in parallel from one
    fused projection (reference: layers/flux.py:254-330)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    norm_cls: str = "layernorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vec, cos, sin, deterministic=True):
        d = self.hidden_size
        hd = d // self.num_heads
        b, n, _ = x.shape
        mlp_dim = int(d * self.mlp_ratio)

        mod_shift, mod_scale, mod_gate = Modulation(
            dim=d, double=False, name="modulation"
        )(vec)
        x_n = _norm(self.norm_cls, d, "pre_norm")(x)
        x_n = x_n * (1 + mod_scale[:, None]) + mod_shift[:, None]

        fused = nn.Dense(3 * d + mlp_dim, dtype=self.dtype, name="linear1")(x_n)
        qkv, mlp = fused[..., : 3 * d], fused[..., 3 * d :]
        q, k, v = (
            t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        q = _qk_norm(self.norm_cls, hd, "q_norm")(q)
        k = _qk_norm(self.norm_cls, hd, "k_norm")(k)
        attn = rope_attention(q, k, v, cos, sin)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)

        out = nn.Dense(d, dtype=self.dtype, name="linear2")(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], axis=-1)
        )
        return x + mod_gate[:, None] * out


class LastLayer(nn.Module):
    hidden_size: int
    out_dim: int
    norm_cls: str = "layernorm"

    @nn.compact
    def __call__(self, x, vec):
        mod = nn.Dense(
            2 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            name="mod",
        )(nn.silu(vec))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = _norm(self.norm_cls, self.hidden_size, "norm")(x)
        x = x * (1 + scale[:, None]) + shift[:, None]
        return nn.Dense(
            self.out_dim, kernel_init=nn.initializers.zeros, name="proj"
        )(x)
