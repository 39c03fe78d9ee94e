"""Chewie building blocks: PoolFormer token mixing inside MMDiT blocks.

Counterpart of /root/reference/xdiffusion/layers/chewie.py:12-143.
Chewie replaces the double-stream blocks' attention with a Pooling token
mixer (PoolFormer, https://arxiv.org/abs/2111.11418): the modulated
img/txt tokens are reshaped to heads, RoPE-rotated, average-pooled with
a (pool, pool) window over the (sequence, head-dim) plane, and the
pooled-minus-identity result is projected back per stream. No q/k/v
projections exist in these blocks.

TPU note: the reference's AvgPool2d(count_include_pad=False) becomes a
sum reduce_window divided by a precomputed (static-shape) window-count
plane — one fused XLA op pair instead of a masked average.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xdiffusion_tpu.layers.flux import Modulation, apply_rope, _norm


def pooling_token_mixer(x: jax.Array, pool_size: int = 3) -> jax.Array:
    """PoolFormer mixing on (B, H, L, D): avg_pool(x) - x with a
    (pool, pool) window, stride 1, same padding, edge counts excluded
    (torch AvgPool2d(count_include_pad=False) semantics,
    reference layers/chewie.py:12-26)."""
    pad = pool_size // 2
    window = (1, 1, pool_size, pool_size)
    summed = jax.lax.reduce_window(
        x,
        jnp.array(0, dtype=x.dtype),
        jax.lax.add,
        window_dimensions=window,
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )
    # Per-position divisor: number of in-bounds taps. Static shapes ->
    # constant-folded by XLA.
    l, d = x.shape[2], x.shape[3]
    ones = np.ones((1, 1, l, d), dtype=np.float32)
    counts = jax.lax.reduce_window(
        jnp.asarray(ones),
        jnp.array(0, dtype=jnp.float32),
        jax.lax.add,
        window_dimensions=window,
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )
    return summed / counts.astype(x.dtype) - x


class ChewieDoubleStreamBlock(nn.Module):
    """MMDiT double-stream block with pooling instead of attention
    (reference layers/chewie.py:28-143): modulate -> heads -> RoPE ->
    pool-mix -> per-stream projection + gated MLP."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    pool_size: int = 3
    qkv_bias: bool = False  # accepted for config parity; no qkv exists
    norm_cls: str = "layernorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, img, txt, vec, cos, sin, deterministic=True
    ) -> Tuple[jax.Array, jax.Array]:
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
        txt_n = _norm(self.norm_cls, d, "txt_norm1")(txt)
        txt_n = txt_n * (1 + ts1[:, None]) + tm1[:, None]

        # txt tokens lead the merged sequence (reference chewie.py:104-113).
        merged = jnp.concatenate([heads(txt_n, n_txt), heads(img_n, n_img)], axis=2)
        merged = apply_rope(merged, cos, sin)
        mixed = pooling_token_mixer(merged, self.pool_size)
        mixed = mixed.transpose(0, 2, 1, 3).reshape(b, n_txt + n_img, d)
        txt_attn, img_attn = mixed[:, :n_txt], mixed[:, n_txt:]

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
