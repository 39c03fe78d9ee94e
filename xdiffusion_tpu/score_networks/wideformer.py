"""WideFormer: a WIDE (not deep) Flux-style rectified-flow transformer.

Counterpart of /root/reference/xdiffusion/score_networks/wideformer.py:18-209.
Each layer runs `transformer_width` parallel double-stream blocks over the
image tokens; their outputs are concatenated feature-wise and re-viewed as a
(width * L)-token sequence, which each block of the next layer first
compresses back to L tokens with a Conv1d "token mixer" (token index as the
channel axis, 3-tap convolution along the feature axis) before attending.
Text conditioning follows Flux: T5 token stream + pooled CLIP vector into
the modulation vec, 3-axis RoPE over (0, row, col) ids.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import glide_timestep_embedding
from xdiffusion_tpu.layers.flux import (
    DoubleStreamBlock,
    LastLayer,
    MLPEmbedder,
    rope_frequencies,
)


class WideFormerSingleBlock(nn.Module):
    """Token mixer (when the incoming sequence is wider than L) followed by
    one double-stream block (reference wideformer.py:18-52)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float
    in_tokens: int
    out_tokens: int

    @nn.compact
    def __call__(self, img, txt, vec, cos, sin, deterministic: bool = True):
        if self.in_tokens != self.out_tokens:
            # torch Conv1d(in=L_in, out=L_out, k=3, pad=1) over (B, L, D):
            # tokens are the channel axis, the conv slides along features.
            h = img.transpose(0, 2, 1)  # (B, D, L_in)
            h = nn.Conv(
                features=self.out_tokens,
                kernel_size=(3,),
                padding="SAME",
                name="token_mixer",
            )(h)
            h = h.transpose(0, 2, 1)  # (B, L_out, D)
        else:
            h = img
        return DoubleStreamBlock(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=True,
            name="block",
        )(h, txt, vec, cos, sin, deterministic=deterministic)


class WideFormer(nn.Module):
    """config keys (reference wideformer.py:60-128): patch_size,
    in_channels (= C * patch^2), hidden_size, num_heads, axes_dim, theta,
    vec_in_dim, context_in_dim, max_text_tokens, input_spatial_size,
    mlp_ratio, transformer_width, depth, guidance_embed."""

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
        self._width = int(cfg.transformer_width)
        self._depth = int(cfg.depth)
        mlp_ratio = float(cfg.mlp_ratio)

        image_tokens = (int(cfg.input_spatial_size) // self._patch_size) ** 2

        self._img_in = nn.Dense(d, name="img_in")
        self._time_in = MLPEmbedder(hidden_dim=d, name="time_in")
        self._vector_in = MLPEmbedder(hidden_dim=d, name="vector_in")
        self._txt_in = nn.Dense(d, name="txt_in")

        blocks = []
        for layer_idx in range(self._depth):
            in_tokens = (
                image_tokens if layer_idx == 0 else image_tokens * self._width
            )
            blocks.append(
                [
                    WideFormerSingleBlock(
                        hidden_size=d,
                        num_heads=self._num_heads,
                        mlp_ratio=mlp_ratio,
                        in_tokens=in_tokens,
                        out_tokens=image_tokens,
                        name=f"layer{layer_idx}_block{w}",
                    )
                    for w in range(self._width)
                ]
            )
        self._channels = blocks
        self._final_block = WideFormerSingleBlock(
            hidden_size=d,
            num_heads=self._num_heads,
            mlp_ratio=mlp_ratio,
            in_tokens=image_tokens * self._width,
            out_tokens=image_tokens,
            name="final_block",
        )
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

        n_tokens = img.shape[1]
        d = img.shape[2]

        layer_output = []
        for block in self._channels[0]:
            img_tokens, _ = block(img, txt, vec, cos, sin, deterministic)
            layer_output.append(img_tokens)

        for layer in self._channels[1:]:
            # (B, L, width*D) -> (B, width*L, D), exactly the reference's
            # cat(dim=2).view interleaving (wideformer.py:185-190).
            layer_input = jnp.concatenate(layer_output, axis=2).reshape(
                b, n_tokens * self._width, d
            )
            layer_output = []
            for block in layer:
                img_tokens, _ = block(
                    layer_input, txt, vec, cos, sin, deterministic
                )
                layer_output.append(img_tokens)

        layer_input = jnp.concatenate(layer_output, axis=2).reshape(
            b, n_tokens * self._width, d
        )
        img, _ = self._final_block(layer_input, txt, vec, cos, sin, deterministic)

        img = self._final(img, vec)  # (B, L, C*p*p)
        img = img.reshape(b, gh, gw, c, p, p).transpose(0, 1, 4, 2, 5, 3)
        return img.reshape(b, h, w, c)
