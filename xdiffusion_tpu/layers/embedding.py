"""Embedding / projection layers for conditioning signals.

Counterparts of the reference embedding layers
(/root/reference/xdiffusion/layers/embedding.py:52-240): sinusoidal
timestep features + MLP projections, class-label embeddings, and the
`RunProjection` context-transformer glue that turns raw context signals
(`timestep`, `classes`) into embeddings consumed by the blocks.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_embedding(
    t: jax.Array, embedding_dim: int, max_time: float = 1000.0, theta: float = 10000.0
) -> jax.Array:
    """Transformer sinusoidal features of a (B,) time vector.

    Times are rescaled by 1000/max_time so discrete indices (max_time=1000)
    and continuous times in [0,1] (max_time=1.0) land on the same frequency
    band (reference: embedding.py:66-76). Output is (B, embedding_dim) with
    sin features first.
    """
    x = t.astype(jnp.float32) * (1000.0 / max_time)
    half_dim = embedding_dim // 2
    freqs = jnp.exp(
        jnp.arange(half_dim, dtype=jnp.float32) * (-math.log(theta) / (half_dim - 1))
    )
    args = x[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def glide_timestep_embedding(
    t: jax.Array,
    dim: int,
    max_period: float = 10000.0,
    scale: float = 1.0,
    flip_sin_to_cos: bool = True,
) -> jax.Array:
    """GLIDE/DiT-style sinusoidal features (reference layers/utils.py:
    90-121): freqs = exp(-log(max_period) * arange(half) / half) — note
    the `half` divisor, unlike the transformer variant's `half - 1` —
    and cos-first output when flip_sin_to_cos (the default)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / half
    )
    args = scale * (t.astype(jnp.float32)[:, None] * freqs[None, :])
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def interleaved_frame_position_encoding(length: int, dim: int) -> jax.Array:
    """The video wrappers' frame-position code (reference
    video_ldm.py:56-77 / animate_diff.py:22-43 PositionalEncoding):
    freq_i = 10000^(i/dim) — note the `dim` divisor on a `dim/2`-length
    index — with sin/cos INTERLEAVED pairs, pe[l] = [sin(l/f0), cos(l/f0),
    sin(l/f1), ...]."""
    freq = jnp.exp(
        jnp.arange(dim // 2, dtype=jnp.float32) / dim * math.log(10000.0)
    )
    x = jnp.arange(length, dtype=jnp.float32)[:, None] / freq[None, :]
    return jnp.stack([jnp.sin(x), jnp.cos(x)], axis=-1).reshape(length, dim)


class TimestepEmbeddingProjection(nn.Module):
    """Sinusoidal features -> 2-layer SiLU MLP (reference: embedding.py:79).

    Output dim is num_features * time_embedding_mult.
    """

    num_features: int
    time_embedding_mult: int = 4
    max_time: float = 1000.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timestep: jax.Array, context: Dict = None) -> jax.Array:
        dim = self.num_features * self.time_embedding_mult
        emb = sinusoidal_embedding(timestep, self.num_features, self.max_time)
        emb = nn.Dense(dim, dtype=self.dtype, name="fc1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(dim, dtype=self.dtype, name="fc2")(emb)
        return emb


class InvCosTimestepEmbeddingProjection(nn.Module):
    """Timestep projection over arctan(exp(-logsnr/2)) warped time.

    Used by continuous (logSNR-conditioned) models so the network sees a
    bounded [0,1] time signal (reference: embedding.py:108-140).
    """

    num_features: int
    time_embedding_mult: int = 4
    max_time: float = 1000.0
    clip_min: float = -20.0
    clip_max: float = 20.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timestep: jax.Array, context: Dict = None) -> jax.Array:
        warped = jnp.arctan(
            jnp.exp(-0.5 * jnp.clip(timestep, self.clip_min, self.clip_max))
        ) / (0.5 * math.pi)
        dim = self.num_features * self.time_embedding_mult
        emb = sinusoidal_embedding(warped, self.num_features, self.max_time)
        emb = nn.Dense(dim, dtype=self.dtype, name="fc1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(dim, dtype=self.dtype, name="fc2")(emb)
        return emb


class LabelEmbeddingProjection(nn.Module):
    """Class-label embedding with a NULL row for CFG (id == num_classes)."""

    num_classes: int
    embedding_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, classes: jax.Array, context: Dict = None) -> jax.Array:
        table = nn.Embed(
            self.num_classes + 1, self.embedding_dim, dtype=self.dtype, name="embed"
        )
        return table(classes.astype(jnp.int32))


class TextTokenProjection(nn.Module):
    """Token-id -> embedding table (reference: embedding.py:190-199)."""

    token_vocabulary_size: int
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, context: Dict = None) -> jax.Array:
        table = nn.Embed(
            self.token_vocabulary_size, self.width, dtype=self.dtype,
            name="embed",
        )
        return table(tokens.astype(jnp.int32))


class DiTTimestepEmbedding(nn.Module):
    """DiT timestep embedder: sinusoidal features -> SiLU MLP
    (reference: embedding.py:325-343)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    max_time: float = 1000.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timestep: jax.Array, context: Dict = None) -> jax.Array:
        init = nn.initializers.normal(stddev=0.02)
        # Reference DiTTimestepEmbedding feeds the GLIDE-style features
        # (embedding.py:336 -> layers/utils.py:90) — cos-first, `half`
        # frequency divisor, no time rescaling at max_time=1000.
        emb = glide_timestep_embedding(
            timestep.astype(jnp.float32) * (1000.0 / self.max_time),
            self.frequency_embedding_size,
        )
        emb = nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype,
                       name="fc1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype,
                       name="fc2")(emb)
        return emb


class DiTLabelEmbedding(nn.Module):
    """DiT class-label embedding with NULL row for CFG
    (reference: embedding.py:346-383). Training-time label dropout is
    handled by the diffusion process's CFG mask, not here."""

    num_classes: int
    hidden_size: int
    # Accepted for reference-config compatibility; train-time label
    # dropout runs through the diffusion process's CFG mask instead
    # (reference drops to a ZERO embedding, embedding.py:375-381).
    drop_prob: float = 0.0
    unconditional_override: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jax.Array, context: Dict = None) -> jax.Array:
        table = nn.Embed(
            self.num_classes + 1,
            self.hidden_size,
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype,
            name="table",
        )
        if self.unconditional_override:
            labels = jnp.zeros_like(labels) + self.num_classes
        return table(labels.astype(jnp.int32))


class DiTCombineEmbeddings:
    """Context head op summing several embeddings into one key
    (reference: embedding.py:385-406)."""

    def __init__(self, output_context_key: str, source_context_keys, **kwargs):
        self.output_context_key = output_context_key
        self.source_context_keys = list(source_context_keys)

    def __call__(self, context: Dict, projections: Dict = None) -> Dict:
        new_context = dict(context)
        x = context[self.source_context_keys[0]]
        for key in self.source_context_keys[1:]:
            x = x + context[key]
        new_context[self.output_context_key] = x
        return new_context


# Reference configs spell it without the 'i' (embedding.py:385).
DiTCombineEmbeddngs = DiTCombineEmbeddings


def sincos_position_embedding_2d(
    embed_dim: int,
    grid_h: int,
    grid_w: int,
    base_size: int = None,
    lewei_scale: float = 1.0,
) -> jax.Array:
    """Fixed 2D sin-cos positional embedding, (grid_h*grid_w, embed_dim).

    Matches the reference `get_2d_sincos_pos_embed` exactly
    (reference layers/utils.py:188-258, the ViT/MAE construction as used
    by DiT/PixArt): the FIRST embed_dim/2 channels encode the *column*
    coordinate and the second half the *row* coordinate (the reference
    builds `meshgrid(grid_w, grid_h)` with w first). When `base_size` is
    given, positions are rescaled `arange(g) / (g / base_size) /
    lewei_scale` (reference DiT passes the default base_size=16; PixArt
    passes base_size = grid so positions stay integral).
    """
    assert embed_dim % 4 == 0
    import numpy as np

    def one_dim(dim, positions):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / (10000.0**omega)
        out = np.einsum("p,f->pf", positions, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_y = np.arange(grid_h, dtype=np.float32)
    grid_x = np.arange(grid_w, dtype=np.float32)
    if base_size is not None:
        grid_y = grid_y / (grid_h / base_size) / lewei_scale
        grid_x = grid_x / (grid_w / base_size) / lewei_scale
    yy, xx = np.meshgrid(
        grid_y.astype(np.float64), grid_x.astype(np.float64), indexing="ij"
    )
    emb_w = one_dim(embed_dim // 2, xx.reshape(-1))
    emb_h = one_dim(embed_dim // 2, yy.reshape(-1))
    return jnp.asarray(
        jnp.concatenate([jnp.asarray(emb_w), jnp.asarray(emb_h)], axis=1),
        dtype=jnp.float32,
    )


class PatchEmbed(nn.Module):
    """NHWC image -> (B, N, D) patch tokens via a strided conv
    (reference: embedding.py:409-510, timm-style)."""

    patch_size: int
    embed_dim: int
    bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0, f"{(h, w)} not divisible by {p}"
        x = nn.Conv(
            self.embed_dim,
            (p, p),
            strides=(p, p),
            use_bias=self.bias,
            dtype=self.dtype,
            name="proj",
        )(x)
        return x.reshape(b, (h // p) * (w // p), self.embed_dim)


class ContextProjection(nn.Module):
    """Context head: ctx[out_key] = MLP(ctx[in_key])
    (reference: embedding.py:202-240). Projects e.g. frozen text-encoder
    embeddings into the cross-attention width."""

    input_context_key: str
    output_context_key: str
    in_features: int
    hidden_features: int
    out_features: int
    custom_initialization: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context: Dict, projections: Dict = None) -> Dict:
        init = (
            nn.initializers.normal(stddev=0.02)
            if self.custom_initialization
            else nn.initializers.lecun_normal()
        )
        x = context[self.input_context_key]
        x = nn.Dense(self.hidden_features, kernel_init=init, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(self.out_features, kernel_init=init, dtype=self.dtype,
                     name="fc2")(x)
        new_context = dict(context)
        new_context[self.output_context_key] = x
        return new_context


class T5TextTokensToEmbedding(nn.Module):
    """Token ids -> embeddings with the T5 vocabulary contract.

    The reference wraps a frozen pretrained T5 encoder
    (embedding.py:511-600); pretrained weights are unavailable in this
    offline environment, so this degrades to a trainable embedding table
    over the T5 vocab with the same (B, L, d_model) output contract. Drop
    in the real flax T5 encoder when weights are present.
    """

    model_name: str = "google/t5-v1_1-base"
    vocab_size: int = 32128
    d_model: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, context: Dict = None) -> jax.Array:
        table = nn.Embed(
            self.vocab_size, self.d_model, dtype=self.dtype, name="embed"
        )
        return table(tokens.astype(jnp.int32))


class T5TextPromptsToTokens:
    """HOST-side projection: prompt strings -> token ids (B, max_length).

    Runs before jit (strings cannot be traced); uses the HF T5 tokenizer
    when its assets are cached locally, else the byte-BPE fallback capped
    to the T5 vocab range.
    """

    host_side = True

    def __init__(self, max_length: int = 77,
                 model_name: str = "google/t5-v1_1-base", **kwargs):
        self.max_length = int(max_length)
        self.model_name = model_name
        self._tokenizer = None
        try:  # local HF cache only; no network egress
            from transformers import AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(
                model_name, local_files_only=True
            )
        except Exception:
            from xdiffusion_tpu.tokenizer import get_encoder

            self._bpe = get_encoder()

    def __call__(self, prompts, context: Dict = None):
        import numpy as np

        if self._tokenizer is not None:
            out = self._tokenizer(
                list(prompts),
                max_length=self.max_length,
                padding="max_length",
                truncation=True,
                return_tensors="np",
            )
            return jnp.asarray(out["input_ids"].astype(np.int32))
        tokens = self._bpe.tokenize(list(prompts), self.max_length)
        return jnp.asarray(tokens % 32128)


class _HashEmbedFallback:
    """Deterministic prompt -> embedding fallback for offline environments
    (no pretrained text-encoder weights). Distinct prompts map to stable,
    distinct unit-norm vectors; replace with the real frozen encoder when
    its weights are cached locally."""

    def __init__(self, length: int, dim: int):
        self.length = int(length)
        self.dim = int(dim)

    def __call__(self, text: str):
        import hashlib

        import numpy as np

        seed = int.from_bytes(
            hashlib.sha256(text.encode("utf-8")).digest()[:8], "little"
        )
        rng = np.random.default_rng(seed)
        v = rng.normal(size=(self.length, self.dim)).astype("float32")
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)


class _FrozenEncoderCache:
    """Process-wide cache of loaded frozen encoders, keyed by version.
    Loading is attempted once; a None entry means 'not cached locally'."""

    _loaded: Dict = {}

    @classmethod
    def get(cls, kind: str, version: str):
        key = (kind, version)
        if key not in cls._loaded:
            from xdiffusion_tpu.layers import text_encoders as te

            loader = (
                te.load_pretrained_clip_text
                if kind == "clip"
                else te.load_pretrained_t5
            )
            cls._loaded[key] = loader(version)
        return cls._loaded[key]


class CLIPTextEmbedder:
    """Host-side context preprocessor: prompts -> pooled CLIP embedding at
    context[context_key] (reference: embedding.py:511-545 CLIPTextEmbedder
    over HF CLIPTextModel). Runs the real flax CLIP text tower
    (layers/text_encoders.py) when weights are cached locally; otherwise
    a deterministic hash embedding keeps offline training running."""

    host_side = True

    def __init__(
        self,
        max_length: int = 77,
        version: str = "openai/clip-vit-large-patch14",
        context_key: str = "clip_text_embeddings",
        embedding_dim: int = 768,
        **kwargs,
    ):
        self.context_key = context_key
        self.max_length = int(max_length)
        self.version = version
        self._fallback = _HashEmbedFallback(1, embedding_dim)
        self._cache: Dict[str, Any] = {}
        self._apply = None

    def _encode_real(self, prompts) -> Optional["jnp.ndarray"]:
        import numpy as np

        loaded = _FrozenEncoderCache.get("clip", self.version)
        if loaded is None:
            return None
        cfg, params, tok = loaded
        todo = [p for p in prompts if p not in self._cache]
        if todo:
            enc = tok(
                list(todo),
                truncation=True,
                max_length=self.max_length,
                padding="max_length",
                return_tensors="np",
            )
            if self._apply is None:
                from xdiffusion_tpu.layers.text_encoders import (
                    CLIPTextTransformer,
                )

                model = CLIPTextTransformer(cfg)
                self._apply = jax.jit(model.apply)
            _, pooled = self._apply(
                params, jnp.asarray(enc["input_ids"].astype(np.int32))
            )
            pooled = np.asarray(pooled)
            for i, p in enumerate(todo):
                self._cache[p] = pooled[i]
        return jnp.asarray(np.stack([self._cache[p] for p in prompts]))

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if "text_prompts" not in context or self.context_key in context:
            return context
        import numpy as np

        prompts = list(context["text_prompts"])
        emb = self._encode_real(prompts)
        if emb is None:
            emb = jnp.asarray(
                np.stack([self._fallback(t)[0] for t in prompts])
            )
        new_context = dict(context)
        new_context[self.context_key] = emb
        return new_context


class T5TextEmbedder:
    """Host-side context preprocessor: prompts -> T5 sequence embeddings at
    context[context_key] (reference: embedding.py:546-600 T5TextEmbedder
    over HF T5EncoderModel). Runs the real flax T5 encoder when weights
    are cached locally; hash fallback otherwise."""

    host_side = True

    def __init__(
        self,
        max_length: int = 77,
        version: str = "google/t5-v1_1-base",
        context_key: str = "t5_text_embeddings",
        embedding_dim: int = 768,
        include_temporal: bool = False,
        **kwargs,
    ):
        self.context_key = context_key
        self.max_length = int(max_length)
        self.version = version
        self.include_temporal = bool(include_temporal)
        self._fallback = _HashEmbedFallback(max_length, embedding_dim)
        self._cache: Dict[str, Any] = {}
        self._apply = None

    def _encode_real(self, prompts):
        import numpy as np

        loaded = _FrozenEncoderCache.get("t5", self.version)
        if loaded is None:
            return None
        cfg, params, tok = loaded
        todo = [p for p in prompts if p not in self._cache]
        if todo:
            enc = tok(
                list(todo),
                truncation=True,
                max_length=self.max_length,
                padding="max_length",
                return_tensors="np",
            )
            if self._apply is None:
                from xdiffusion_tpu.layers.text_encoders import T5Encoder

                model = T5Encoder(cfg)
                self._apply = jax.jit(model.apply)
            ids = enc["input_ids"].astype(np.int32)
            mask = enc["attention_mask"].astype(np.int32)
            hidden = np.asarray(
                self._apply(params, jnp.asarray(ids), jnp.asarray(mask))
            )
            for i, p in enumerate(todo):
                self._cache[p] = (hidden[i], mask[i])
        emb = np.stack([self._cache[p][0] for p in prompts])
        mask = np.stack([self._cache[p][1] for p in prompts])
        return jnp.asarray(emb), jnp.asarray(mask)

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if "text_prompts" not in context or self.context_key in context:
            return context
        import numpy as np

        prompts = list(context["text_prompts"])
        real = self._encode_real(prompts)
        new_context = dict(context)
        if real is None:
            emb = jnp.asarray(np.stack([self._fallback(t) for t in prompts]))
        else:
            emb, mask = real
            new_context["text_attention_mask"] = mask
        if self.include_temporal:
            emb = emb[:, None]
        new_context[self.context_key] = emb
        return new_context


class RunProjection:
    """Context-transformer head: context[out_key] = proj(context[in_key]).

    Pure config-glue (reference: embedding.py:240); the actual projection
    module is owned by the score network's projection dict and passed in.
    """

    def __init__(
        self,
        input_context_key: str,
        output_context_key: str,
        projection_key: str,
        **kwargs,
    ):
        self.input_context_key = input_context_key
        self.output_context_key = output_context_key
        self.projection_key = projection_key

    def __call__(self, context: Dict, projections: Dict) -> Dict:
        assert self.input_context_key in context, (
            f"{self.input_context_key} not found for projection "
            f"{self.projection_key}."
        )
        new_context = dict(context)
        new_context[self.output_context_key] = projections[self.projection_key](
            context[self.input_context_key], context=context
        )
        return new_context


class PooledTextEmbeddingsToTimestep(nn.Module):
    """Imagen-style pooled-text-to-time conditioning head: attention-pool
    the (B, L, D) text embeddings with a learned query and add the pooled
    vector (projected to the timestep-embedding width) onto
    context["timestep_embedding"] (reference: Efficient UNet conditioning,
    layers/embedding.py pooled-text head).
    """

    text_embedding_dim: int
    time_embedding_dim: int
    attention_pooling_heads: int = 64  # per-head width
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context: Dict, projections: Dict = None) -> Dict:
        emb = context["text_embeddings"].astype(self.dtype)  # (B, L, D)
        b, l, d = emb.shape
        head_dim = int(self.attention_pooling_heads)
        num_heads = max(1, d // head_dim)
        head_dim = d // num_heads

        # Single learned query attends over the sequence.
        query = self.param(
            "pool_query", nn.initializers.normal(0.02), (d,)
        ).astype(self.dtype)
        q = jnp.broadcast_to(query[None, None], (b, 1, d))
        q = nn.Dense(d, dtype=self.dtype, name="q")(q)
        k = nn.Dense(d, dtype=self.dtype, name="k")(emb)
        v = nn.Dense(d, dtype=self.dtype, name="v")(emb)
        split = lambda t, n: t.reshape(b, n, num_heads, head_dim).transpose(
            0, 2, 1, 3
        )
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", split(q, 1), split(k, l))
            / jnp.sqrt(jnp.asarray(head_dim, self.dtype)),
            axis=-1,
        )
        pooled = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v, l))
        pooled = pooled.transpose(0, 2, 1, 3).reshape(b, d)

        proj = nn.Dense(self.time_embedding_dim, dtype=self.dtype, name="to_time")(
            nn.silu(nn.LayerNorm(dtype=self.dtype, name="norm")(pooled))
        )
        new_context = dict(context)
        new_context["timestep_embedding"] = (
            context["timestep_embedding"] + proj.astype(jnp.float32)
        )
        return new_context


class CLIPTextTokenProjection(nn.Module):
    """CLIP-vocabulary token ids -> (B, L, 768) sequence embeddings.

    The reference wraps the frozen CLIP text transformer
    (embedding.py CLIPTextTokenProjection); offline this degrades to a
    trainable embedding table + position embedding with the same output
    contract.
    """

    text_sequence_length: int = 77
    vocab_size: int = 49408
    width: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, context: Dict = None) -> jax.Array:
        table = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype, name="token_embed"
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.01),
            (self.text_sequence_length, self.width),
        )
        h = table(tokens.astype(jnp.int32))
        return h + pos[None, : h.shape[1]].astype(h.dtype)


class SanaPromptToTextEmbedding:
    """Host-side Gemma-2 prompt embedder for Sana (reference:
    embedding.py SanaPromptToTextEmbedding). Deterministic hash fallback
    offline at the Gemma-2 width (2304)."""

    host_side = True

    def __init__(
        self,
        text_encoder_model_name: str = "google/gemma-2-2b-it",
        max_length: int = 300,
        input_key: str = "text_prompts",
        output_key: str = "text_embeddings",
        use_bfloat16: bool = False,
        embedding_dim: int = 2304,
        **kwargs,
    ):
        self.input_key = input_key
        self.output_key = output_key
        self.context_key = output_key
        self._fallback = _HashEmbedFallback(int(max_length), int(embedding_dim))

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if self.input_key not in context or self.output_key in context:
            return context
        import numpy as np

        emb = np.stack([self._fallback(t) for t in context[self.input_key]])
        new_context = dict(context)
        new_context[self.output_key] = jnp.asarray(emb)
        return new_context
