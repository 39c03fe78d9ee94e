"""Token-sequence transformer + GLIDE text-conditioning wrapper.

Behavioral counterpart of /root/reference/xdiffusion/layers/
transformer.py:249-318: a small pre-LN transformer encodes the embedded
text tokens once at the top of the score network; its last token is
projected and added to the timestep embedding, and the full sequence
becomes context["context_embedding"] consumed by cross-attention layers.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.attention import MultiHeadSelfAttention


class TransformerBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.LayerNorm(name="ln1")(x)
        x = x + MultiHeadSelfAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn"
        )(h, deterministic=deterministic)
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        return x + h


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        for i in range(self.layers):
            x = TransformerBlock(
                width=self.width,
                heads=self.heads,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic=deterministic)
        return x


class GLIDETransformerWrapper(nn.Module):
    """Context head: encode text tokens/embeddings, fold the pooled output
    into the timestep embedding, expose the sequence as context_embedding.
    Called with (context, projections) by the score network."""

    context_dim: int
    width: int
    layers: int
    heads: int
    final_layer_norm: bool = True
    output_projection_dimension: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context: Dict, projections: Dict) -> Dict:
        if "text_embedding" in context:
            xf_in = context["text_embedding"][:, None, :]
        elif "text_tokens" in context:
            xf_in = projections["text_tokens"](
                context["text_tokens"].astype(jnp.int32)
            )
        else:
            raise KeyError(
                "GLIDE transformer needs text tokens or embeddings."
            )
        # Learned global positional offset (reference keeps a single
        # width-sized vector broadcast over positions, transformer.py:281).
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (1, 1, self.width),
        )
        xf_in = xf_in + pos
        xf_out = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            dtype=self.dtype,
            name="transformer",
        )(xf_in)
        if self.final_layer_norm:
            xf_out = nn.LayerNorm(name="final_ln")(xf_out)
        xf_proj = nn.Dense(
            self.output_projection_dimension, dtype=self.dtype, name="proj"
        )(xf_out[:, -1])

        new_context = dict(context)
        new_context["timestep_embedding"] = (
            context["timestep_embedding"] + xf_proj
        )
        new_context["context_embedding"] = xf_out  # (B, L, width)
        return new_context
