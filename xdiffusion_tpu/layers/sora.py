"""Sora/PixArt-Sigma layer library extras.

KVCompressAttention — self attention whose keys/values are spatially
downsampled by sr_ratio before the dot product (PixArt-Sigma's KV
compression), cutting attention FLOPs by sr_ratio^2 for long spatial
sequences. Counterpart of /root/reference/xdiffusion/layers/sora.py:230-
375; parity-tested against the torch layer on imported weights.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xdiffusion_tpu.layers.norm import RMSNorm


class KVCompressAttention(nn.Module):
    """Token self-attention with compressed keys/values.

    Input (B, N, C) with N = H*W spatial tokens (HW passed per call).
    sampling: "conv" (learned depthwise conv initialized to average +
    LayerNorm), "uniform"/"ave" (strided subsampling), "uniform_every"
    (every sr-th token of the flat sequence).
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_norm: bool = False
    sampling: str = "conv"
    sr_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    def _downsample(self, t: jax.Array, hw: Tuple[int, int], sr) -> jax.Array:
        s = self.sr_ratio
        if s == 1:
            return t
        b, n, c = t.shape
        if self.sampling == "uniform_every":
            return t[:, ::s]
        h, w = hw
        grid = t.reshape(b, h, w, c)
        if self.sampling in ("uniform", "ave"):
            # torch nearest-interpolate with integer 1/s == strided pick.
            return grid[:, ::s, ::s].reshape(b, (h // s) * (w // s), c)
        if self.sampling == "conv":
            # Depthwise sr x sr, stride sr conv (initialized to average,
            # reference :259-263) + LayerNorm; params shared between the
            # k and v paths (one torch `self.sr` module).
            kernel, bias, norm = sr
            out = jax.lax.conv_general_dilated(
                grid,
                kernel,
                window_strides=(s, s),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            ) + bias
            out = out.reshape(b, -1, c)
            return norm(out)
        raise ValueError(f"unknown sampling {self.sampling}")

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        hw: Optional[Tuple[int, int]] = None,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, n, c = x.shape
        assert c == self.dim
        hd = c // self.num_heads
        qkv = nn.Dense(
            3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.sr_ratio > 1:
            assert hw is not None, "KV compression needs the (H, W) grid"
            sr = None
            if self.sampling == "conv":
                s = self.sr_ratio
                sr = (
                    self.param(
                        "sr_kernel",
                        lambda key: jnp.full((s, s, 1, c), 1.0 / (s * s)),
                    ),
                    self.param("sr_bias", nn.initializers.zeros, (c,)),
                    nn.LayerNorm(name="sr_norm"),
                )
            k = self._downsample(k, hw, sr)
            v = self._downsample(v, hw, sr)
        m = k.shape[1]
        split = lambda t, l: t.reshape(b, l, self.num_heads, hd).transpose(
            0, 2, 1, 3
        )
        q, k, v = split(q, n), split(k, m), split(v, m)
        if self.qk_norm:
            q = RMSNorm(dim=hd, name="q_norm")(q)
            k = RMSNorm(dim=hd, name="k_norm")(k)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        if mask is not None:
            logits = logits + jnp.where(mask > 0, 0.0, -jnp.inf)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)
