"""Token-sequence transformer + GLIDE text-conditioning wrapper.

Behavioral counterpart of /root/reference/xdiffusion/layers/
transformer.py:249-318: a small pre-LN transformer encodes the embedded
text tokens once at the top of the score network; its last token is
projected and added to the timestep embedding, and the full sequence
becomes context["context_embedding"] consumed by cross-attention layers.
"""

from __future__ import annotations

from typing import Dict, Optional

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


class SpatialTransformer(nn.Module):
    """LDM-style spatial transformer over an NHWC feature map, faithful
    to the reference (layers/transformer.py:103-246): GroupNorm(32,
    eps=1e-6) + 1x1 in-projection to inner_dim, num_layers x
    [norm1 -> self-attn, norm2 -> cross-attn (self when no context),
    norm3 -> GEGLU feed-forward], zero-init 1x1 out-projection, residual.
    Attention is LastChannelCrossAttention (attention.py:191-228):
    bias-free q/k/v, biased out-projection, scale = dim_head**-0.5.
    GEGLU uses the exact (erf) gelu, matching torch's default.
    """

    in_channels: int
    num_layers: int = 1
    attention_heads: int = 1
    attention_channels: int = 64
    context_dim: int = -1
    dropout: float = 0.0
    context_adapter: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[Dict] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        b, hh, ww, c = x.shape
        inner = self.attention_heads * self.attention_channels
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        groups = 32 if c % 32 == 0 else max(1, c // 4)
        h = FastGroupNorm(
            num_groups=groups, epsilon=1e-6, dtype=self.dtype, name="norm"
        )(x)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(
            h.reshape(b, hh * ww, c)
        )

        enc = None
        if self.context_dim not in (None, -1) and context is not None:
            if self.context_adapter and "target" in self.context_adapter:
                from xdiffusion_tpu.config import instantiate_from_config

                enc = instantiate_from_config(dict(self.context_adapter))(
                    context
                )
            else:
                enc = context.get(
                    "text_embeddings", context.get("context_embedding")
                )
            if enc is not None and enc.ndim == 2:
                # (B, context_dim) -> one context token (reference
                # transformer.py:237-239).
                enc = enc[:, None, :]

        def mha(q_seq, kv_seq, name):
            q = nn.Dense(
                inner, use_bias=False, dtype=self.dtype, name=f"{name}_q"
            )(q_seq)
            k = nn.Dense(
                inner, use_bias=False, dtype=self.dtype, name=f"{name}_k"
            )(kv_seq)
            v = nn.Dense(
                inner, use_bias=False, dtype=self.dtype, name=f"{name}_v"
            )(kv_seq)
            from xdiffusion_tpu.ops import attention_qkv

            out = attention_qkv(q, k, v, heads=self.attention_heads)
            return nn.Dense(inner, dtype=self.dtype, name=f"{name}_out")(out)

        ln = lambda i, name: nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name=f"{name}_{i}"
        )
        for i in range(self.num_layers):
            # Self-attention: q, k, v ALL from the normalized input
            # (reference attn1(norm1(x)) with context=None).
            h1 = ln(i, "ln1")(h)
            h = h + mha(h1, h1, f"self_{i}")
            # Cross-attention; self-attention when no context (reference
            # SpatialTransformerBlock.attn2).
            kv = enc.astype(h.dtype) if enc is not None else None
            h2 = ln(i, "ln2")(h)
            h = h + mha(h2, kv if kv is not None else h2, f"cross_{i}")
            ff_in = ln(i, "ln3")(h)
            # GEGLU: proj to 2*(4*inner), value * gelu(gate) — exact gelu
            # (torch F.gelu default), not tanh-approximate.
            gg = nn.Dense(8 * inner, dtype=self.dtype, name=f"ff_geglu_{i}")(
                ff_in
            )
            val, gate = jnp.split(gg, 2, axis=-1)
            ff = val * nn.gelu(gate, approximate=False)
            if self.dropout > 0.0:
                ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
            h = h + nn.Dense(inner, dtype=self.dtype, name=f"ff_out_{i}")(ff)

        out = nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="proj_out",
        )(h)
        return x + out.reshape(b, hh, ww, c)
