"""SD3.5 MMDiT-X: SD3 with dual image-stream attention in early blocks.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/sd35.py:12-176 + layers/sd35.py (Stability's MMDiT-X): the
first `dual_attention_layers` blocks add a second, independent
self-attention over the modulated image stream whose output is summed into
the residual alongside the joint attention (per the SD3.5 reference
implementation).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.ops import dot_product_attention
from xdiffusion_tpu.score_networks.sd3 import (
    MMDiTBlock,
    SD3Transformer2DModel as _SD3,
    _modulate,
)


class MMDiTXBlock(MMDiTBlock):
    """MMDiT block + parallel second self-attention on the image stream."""

    @nn.compact
    def __call__(self, x, c, temb, deterministic: bool = True):
        b, n, d = x.shape
        # Second self-attention over the modulated image stream. Computed
        # before delegating so both paths share the same modulation source.
        mod2 = nn.Dense(
            3 * d, kernel_init=nn.initializers.zeros, name="mod_x2attn"
        )(nn.silu(temb))
        s, sc, g = jnp.split(mod2, 3, axis=-1)
        h = _modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, name="norm_x2attn")(x),
            s, sc,
        )
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, name="qkv_x2")(h)
        q, k, v = (
            t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        attn2 = dot_product_attention(q, k, v)
        attn2 = attn2.transpose(0, 2, 1, 3).reshape(b, n, d)
        attn2 = nn.Dense(d, name="proj_x2")(attn2)

        x_out, c_out = super().__call__(x, c, temb, deterministic=deterministic)
        return x_out + g[:, None] * attn2, c_out


class SD35Transformer2DModel(_SD3):
    """SD3 with MMDiT-X blocks in the first dual_attention_layers."""

    def _make_block(self, i: int, n_layers: int):
        n_dual = int(self.config.get("dual_attention_layers", 2))
        cls = MMDiTXBlock if i < n_dual else MMDiTBlock
        return cls(
            dim=self._dim,
            num_heads=self._num_heads,
            context_pre_only=(i == n_layers - 1),
            name=f"block_{i}",
        )
