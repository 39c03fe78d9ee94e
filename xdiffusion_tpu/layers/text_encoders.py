"""Frozen text-encoder towers: CLIP text transformer and T5 encoder.

Real flax implementations of the architectures the reference conditions
on through HuggingFace (reference layers/clip.py:18 FrozenCLIPEmbedder,
layers/embedding.py:511-600 CLIPTextEmbedder/T5TextEmbedder), plus
importers for HF torch state_dicts so locally cached pretrained weights
(HF cache or $XDIFFUSION_DATA_DIR) load directly. The embedding
preprocessors in layers/embedding.py use these when weights are
available and fall back to the deterministic hash embedding only when
nothing is cached (offline environments).

TPU notes: encoders run once per unique prompt on host-triggered jit
calls and are cached; weights are frozen (no grads), so they live
outside the train state and are donated to the embed program.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# =========================================================================
# CLIP text tower (HF CLIPTextModel-compatible)
# =========================================================================


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None  # set for WithProjection variants


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new"):
        return jax.nn.gelu
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name}")


class _CLIPAttention(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        c = self.config
        d = c.hidden_size
        h = c.num_attention_heads
        hd = d // h
        q = nn.Dense(d, name="q_proj")(x)
        k = nn.Dense(d, name="k_proj")(x)
        v = nn.Dense(d, name="v_proj")(x)
        b, n, _ = x.shape
        split = lambda t: t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        logits = logits + mask
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, name="out_proj")(out)


class _CLIPLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        c = self.config
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1")(x)
        x = x + _CLIPAttention(c, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, name="fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, name="fc2")(h)
        return x + h


class CLIPTextTransformer(nn.Module):
    """CLIP text tower: causal pre-LN transformer over BPE token ids.

    Returns (last_hidden_state, pooled) where pooled is the final-LN
    hidden at the EOS position — HF `pooler_output` semantics. When
    `config.projection_dim` is set, pooled is additionally projected
    (CLIPTextModelWithProjection's `text_embeds`).
    """

    config: CLIPTextConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        penultimate: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        c = self.config
        b, n = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, name="token_embedding")
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (c.max_position_embeddings, c.hidden_size),
        )
        x = tok(input_ids.astype(jnp.int32)) + pos[None, :n, :]

        causal = jnp.triu(jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1)
        mask = causal[None, None]
        if attention_mask is not None:
            pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf)
            mask = mask + pad.astype(jnp.float32)

        penult = x
        for i in range(c.num_hidden_layers):
            if i == c.num_hidden_layers - 1:
                # HF hidden_states[-2]: the input to the final layer,
                # pre-final-LN — SD3's sequence conditioning tap
                # (reference context.py:389-391).
                penult = x
            x = _CLIPLayer(c, name=f"layers_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)

        ids = input_ids.astype(jnp.int32)
        if c.eos_token_id == 2:
            # Legacy HF behavior: EOS is the max token id in the vocab.
            eos_pos = jnp.argmax(ids, axis=-1)
        else:
            eos_pos = jnp.argmax((ids == c.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), eos_pos]
        if c.projection_dim is not None:
            pooled = nn.Dense(
                c.projection_dim, use_bias=False, name="text_projection"
            )(pooled)
        return (penult if penultimate else x), pooled


def import_hf_clip_text(flax_params: Dict, sd: Dict[str, np.ndarray]) -> Dict:
    """Map an HF CLIPTextModel(.WithProjection) state_dict onto
    CLIPTextTransformer params."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    pfx = "text_model."
    if not any(k.startswith(pfx) for k in sd):
        pfx = ""
    flat = flatten_dict(flax_params)
    out = {}
    for path, value in flat.items():
        sub = [str(p) for p in (path[1:] if path[0] == "params" else path)]
        leaf = sub[-1]
        if sub[0] == "token_embedding":
            key = f"{pfx}embeddings.token_embedding.weight"
            t = sd[key]
        elif sub[0] == "position_embedding":
            t = sd[f"{pfx}embeddings.position_embedding.weight"]
        elif sub[0] == "final_layer_norm":
            t = sd[f"{pfx}final_layer_norm.{'weight' if leaf == 'scale' else 'bias'}"]
        elif sub[0] == "text_projection":
            t = sd["text_projection.weight"].T
        elif sub[0].startswith("layers_"):
            i = sub[0].split("_")[-1]
            mod = sub[1]
            base = f"{pfx}encoder.layers.{i}"
            if mod == "self_attn":
                key = f"{base}.self_attn.{sub[2]}.{'weight' if leaf == 'kernel' else 'bias'}"
                t = sd[key].T if leaf == "kernel" else sd[key]
            elif mod in ("layer_norm1", "layer_norm2"):
                key = f"{base}.{mod}.{'weight' if leaf == 'scale' else 'bias'}"
                t = sd[key]
            elif mod in ("fc1", "fc2"):
                key = f"{base}.mlp.{mod}.{'weight' if leaf == 'kernel' else 'bias'}"
                t = sd[key].T if leaf == "kernel" else sd[key]
            else:
                raise KeyError(f"unmapped CLIP path {sub}")
        else:
            raise KeyError(f"unmapped CLIP path {sub}")
        t = np.asarray(t)
        if t.shape != value.shape:
            raise ValueError(f"shape mismatch at {sub}: {t.shape} vs {value.shape}")
        out[path] = t.astype(np.asarray(value).dtype)
    return unflatten_dict(out)


# =========================================================================
# T5 encoder stack (HF T5EncoderModel-compatible)
# =========================================================================


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"  # t5-v1_1; classic t5 = "relu"


class _T5RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


def _t5_relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional bucketing (HF T5Attention._relative_position_bucket)."""
    ret = np.zeros_like(relative_position)
    num_buckets //= 2
    ret += (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


class _T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, position_bias: Optional[jax.Array]
    ) -> Tuple[jax.Array, jax.Array]:
        c = self.config
        inner = c.num_heads * c.d_kv
        b, n, _ = x.shape
        q = nn.Dense(inner, use_bias=False, name="q")(x)
        k = nn.Dense(inner, use_bias=False, name="k")(x)
        v = nn.Dense(inner, use_bias=False, name="v")(x)
        split = lambda t: t.reshape(b, n, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        if position_bias is None:
            # Bias table lives only in block 0 and is shared downstream
            # (HF semantics). Bucket indices are static for a given n.
            table = nn.Embed(
                c.relative_attention_num_buckets,
                c.num_heads,
                name="relative_attention_bias",
            )
            ctx_pos = np.arange(n)[:, None]
            mem_pos = np.arange(n)[None, :]
            buckets = _t5_relative_position_bucket(
                mem_pos - ctx_pos,
                c.relative_attention_num_buckets,
                c.relative_attention_max_distance,
            )
            position_bias = table(jnp.asarray(buckets)).transpose(2, 0, 1)[None]

        # T5 applies NO 1/sqrt(d) scaling (folded into initialization).
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        logits = logits + position_bias + mask
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(c.d_model, use_bias=False, name="o")(out), position_bias


class _T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias):
        c = self.config
        h = _T5RMSNorm(eps=c.layer_norm_epsilon, name="attn_norm")(x)
        attn_out, position_bias = _T5Attention(
            c, has_relative_bias=self.has_relative_bias, name="attn"
        )(h, mask, position_bias)
        x = x + attn_out
        h = _T5RMSNorm(eps=c.layer_norm_epsilon, name="ff_norm")(x)
        if c.feed_forward_proj.startswith("gated"):
            act = _act("gelu_new" if "gelu" in c.feed_forward_proj else "relu")
            g = act(nn.Dense(c.d_ff, use_bias=False, name="wi_0")(h))
            u = nn.Dense(c.d_ff, use_bias=False, name="wi_1")(h)
            h = g * u
        else:
            h = _act("relu")(nn.Dense(c.d_ff, use_bias=False, name="wi")(h))
        h = nn.Dense(c.d_model, use_bias=False, name="wo")(h)
        return x + h, position_bias


class T5Encoder(nn.Module):
    """T5 encoder stack over sentencepiece token ids; returns the final
    RMS-normed hidden states (HF `last_hidden_state`)."""

    config: T5Config

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        c = self.config
        x = nn.Embed(c.vocab_size, c.d_model, name="shared")(
            input_ids.astype(jnp.int32)
        )
        if attention_mask is not None:
            mask = jnp.where(
                attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf
            ).astype(jnp.float32)
        else:
            mask = jnp.zeros((1, 1, 1, input_ids.shape[1]), dtype=jnp.float32)
        position_bias = None
        for i in range(c.num_layers):
            x, position_bias = _T5Block(
                c, has_relative_bias=(i == 0), name=f"block_{i}"
            )(x, mask, position_bias)
        return _T5RMSNorm(eps=c.layer_norm_epsilon, name="final_norm")(x)


def import_hf_t5_encoder(flax_params: Dict, sd: Dict[str, np.ndarray]) -> Dict:
    """Map an HF T5EncoderModel state_dict onto T5Encoder params."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(flax_params)
    out = {}
    for path, value in flat.items():
        sub = [str(p) for p in (path[1:] if path[0] == "params" else path)]
        leaf = sub[-1]
        if sub[0] == "shared":
            t = sd.get("shared.weight", sd.get("encoder.embed_tokens.weight"))
        elif sub[0] == "final_norm":
            t = sd["encoder.final_layer_norm.weight"]
        elif sub[0].startswith("block_"):
            i = sub[0].split("_")[-1]
            base = f"encoder.block.{i}"
            mod = sub[1]
            if mod == "attn_norm":
                t = sd[f"{base}.layer.0.layer_norm.weight"]
            elif mod == "ff_norm":
                t = sd[f"{base}.layer.1.layer_norm.weight"]
            elif mod == "attn":
                inner = sub[2]
                if inner == "relative_attention_bias":
                    t = sd[f"{base}.layer.0.SelfAttention.relative_attention_bias.weight"]
                else:
                    t = sd[f"{base}.layer.0.SelfAttention.{inner}.weight"].T
            elif mod in ("wi", "wi_0", "wi_1", "wo"):
                t = sd[f"{base}.layer.1.DenseReluDense.{mod}.weight"].T
            else:
                raise KeyError(f"unmapped T5 path {sub}")
        else:
            raise KeyError(f"unmapped T5 path {sub}")
        t = np.asarray(t)
        if t.shape != value.shape:
            raise ValueError(f"shape mismatch at {sub}: {t.shape} vs {value.shape}")
        out[path] = t.astype(np.asarray(value).dtype)
    return unflatten_dict(out)


# =========================================================================
# Pretrained loading (HF local cache / $XDIFFUSION_DATA_DIR; no egress)
# =========================================================================


def _data_dir() -> Optional[str]:
    return os.environ.get("XDIFFUSION_DATA_DIR")


def load_pretrained_clip_text(version: str, with_projection: bool = False):
    """Try to materialize a pretrained CLIP text tower.

    Returns (config, params, tokenizer) or None when no weights are
    cached locally. Never hits the network. `with_projection` loads
    CLIPTextModelWithProjection semantics (pooled -> text_embeds), the
    flavor SD3's triple-encoder conditioning uses
    (reference context.py:273-279).
    """
    try:
        from transformers import AutoTokenizer, CLIPTextModel

        if with_projection:
            from transformers import CLIPTextModelWithProjection

            hf = CLIPTextModelWithProjection.from_pretrained(
                version, local_files_only=True
            )
        else:
            hf = CLIPTextModel.from_pretrained(version, local_files_only=True)
        tok = AutoTokenizer.from_pretrained(version, local_files_only=True)
    except Exception:
        return None
    hc = hf.config
    cfg = CLIPTextConfig(
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        intermediate_size=hc.intermediate_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        max_position_embeddings=hc.max_position_embeddings,
        layer_norm_eps=hc.layer_norm_eps,
        hidden_act=hc.hidden_act,
        eos_token_id=hc.eos_token_id,
        projection_dim=hc.projection_dim if with_projection else None,
    )
    model = CLIPTextTransformer(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), dtype=jnp.int32)
    )
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    params = import_hf_clip_text(params, sd)
    return cfg, params, tok


def load_pretrained_t5(version: str):
    """Try to materialize a pretrained T5 encoder; see
    load_pretrained_clip_text for the contract."""
    try:
        from transformers import AutoTokenizer, T5EncoderModel

        hf = T5EncoderModel.from_pretrained(version, local_files_only=True)
        tok = AutoTokenizer.from_pretrained(version, local_files_only=True)
    except Exception:
        return None
    hc = hf.config
    cfg = T5Config(
        vocab_size=hc.vocab_size,
        d_model=hc.d_model,
        d_kv=hc.d_kv,
        d_ff=hc.d_ff,
        num_layers=hc.num_layers,
        num_heads=hc.num_heads,
        relative_attention_num_buckets=hc.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(
            hc, "relative_attention_max_distance", 128
        ),
        layer_norm_epsilon=hc.layer_norm_epsilon,
        feed_forward_proj=hc.feed_forward_proj,
    )
    model = T5Encoder(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), dtype=jnp.int32)
    )
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    params = import_hf_t5_encoder(params, sd)
    return cfg, params, tok
