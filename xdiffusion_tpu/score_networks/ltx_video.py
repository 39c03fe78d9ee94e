"""LTX-Video transformer (latent-space video DiT).

Faithful counterpart of /root/reference/xdiffusion/
score_networks/ltx_video.py:56-468 + layers/ltx.py (LTX-Video,
arXiv:2501.00103): tokens are the flattened causal-VAE latent grid
(F, H, W, C); every block runs [self-attention, caption cross-attention,
feed-forward] with adaLN-single modulation (shared AdaLayerNormSingle MLP
+ per-block scale_shift_table, like PixArt). Distinctives implemented to
match the reference exactly:

- FRACTIONAL-position, EXP-SPACED RoPE (reference ltx_video.py:238-301):
  positions are normalized by positional_embedding_max_pos, frequencies
  are theta**linspace(0,1,dim//6) * pi/2 applied to (2*frac - 1), laid
  out freq-major over the three axes, cos/sin interleave-doubled over the
  FULL inner dim (front-padded with identity when dim % 6 != 0), and
  rotation applies to q/k BEFORE the head split.
- RMSNorm standardization (affine-free, eps 1e-6) and LEARNED qk RMSNorm
  over the full inner dim (eps 1e-5) in both attentions
  (layers/ltx.py:383-393).
- Cross-attention reads the block residual RAW (no norm) under
  adaptive_norm='single_scale_shift' (layers/ltx.py:241-245).
- Skip-layer guidance masks (reference :153-166, layers/ltx.py:856-862):
  context["skip_layer_mask"] of shape (num_layers, B) blends each
  block's self-attention output with its input (SkipLayerStrategy.
  Attention, the strategy the reference forward hardcodes) — the STG
  sampling knob.

Rectified-flow prediction; timestep_scale_multiplier maps [0,1] times
onto the discrete embedding band.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import glide_timestep_embedding
from xdiffusion_tpu.layers.norm import RMSNorm
from xdiffusion_tpu.ops import dot_product_attention


def _rms_no_affine(x: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    rrms = jax.lax.rsqrt(jnp.mean(x32**2, axis=-1, keepdims=True) + eps)
    return (x32 * rrms).astype(x.dtype)


def ltx_rope_frequencies(
    ids: jax.Array,  # (N, 3) raw (frame, row, col) indices
    dim: int,
    max_pos: Tuple[int, int, int],
    theta: float = 10000.0,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables (N, dim) for the LTX fractional exp-spaced RoPE
    (reference ltx_video.py:248-301, spacing='exp')."""
    n6 = dim // 6
    frac = ids.astype(jnp.float32) / jnp.asarray(max_pos, jnp.float32)
    # theta ** linspace(log_theta(1), log_theta(theta), dim//6) * pi/2
    indices = theta ** jnp.linspace(0.0, 1.0, n6, dtype=jnp.float32)
    indices = indices * (math.pi / 2.0)
    # (N, 3, n6) -> (N, n6, 3) -> (N, 3*n6), freq-major over axes.
    freqs = indices[None, None, :] * (frac[:, :, None] * 2.0 - 1.0)
    freqs = freqs.transpose(0, 2, 1).reshape(ids.shape[0], 3 * n6)
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)
    pad = dim % 6
    if pad:
        cos = jnp.concatenate([jnp.ones_like(cos[:, :pad]), cos], axis=-1)
        sin = jnp.concatenate([jnp.zeros_like(sin[:, :pad]), sin], axis=-1)
    return cos, sin


def _apply_ltx_rope(t: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate (B, N, D) by interleaved-pair rope tables (N, D)
    (reference layers/ltx.py:736-750)."""
    b, n, d = t.shape
    x = t.reshape(b, n, d // 2, 2)
    rot = jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(b, n, d)
    return t * cos[None] + rot * sin[None]


class LTXBlock(nn.Module):
    """One BasicTransformerBlock (reference layers/ltx.py:21-274) with
    adaptive_norm='single_scale_shift' and rms_norm standardization."""

    dim: int
    num_heads: int
    attention_bias: bool = True
    norm_eps: float = 1e-6
    rms_standardization: bool = True

    def _norm(self, x):
        if self.rms_standardization:
            return _rms_no_affine(x, self.norm_eps)
        return nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=self.norm_eps
        )(x)

    @nn.compact
    def __call__(
        self, x, y, shared_mod, cos, sin,
        text_mask: Optional[jax.Array] = None,
        skip_mask: Optional[jax.Array] = None,  # (B,) 1=keep, 0=skip attn
        deterministic: bool = True,
    ):
        d = self.dim
        b, n, _ = x.shape
        hd = d // self.num_heads
        block_table = self.param(
            "scale_shift_table",
            lambda key: jax.random.normal(key, (6, d)) / d**0.5,
        )
        mod = shared_mod + block_table[None]
        s1, sc1, g1, s2, sc2, g2 = (mod[:, i] for i in range(6))

        h = self._norm(x)
        h = h * (1 + sc1[:, None]) + s1[:, None]
        qkv = nn.Dense(3 * d, use_bias=self.attention_bias, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # Learned RMS qk-norm over the FULL inner dim, then rope, then
        # the head split (reference AttnProcessor2_0:814-839).
        q = RMSNorm(dim=d, eps=1e-5, name="q_norm")(q)
        k = RMSNorm(dim=d, eps=1e-5, name="k_norm")(k)
        q = _apply_ltx_rope(q, cos, sin)
        k = _apply_ltx_rope(k, cos, sin)
        to_heads = lambda t, l: t.reshape(
            b, l, self.num_heads, hd
        ).transpose(0, 2, 1, 3)
        attn = dot_product_attention(to_heads(q, n), to_heads(k, n), to_heads(v, n))
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
        if skip_mask is not None:
            # SkipLayerStrategy.Attention: blend the attention output with
            # its (normed, modulated) input per sample.
            m = skip_mask[:, None, None].astype(attn.dtype)
            attn = attn * m + h * (1.0 - m)
        x = x + g1[:, None] * nn.Dense(d, name="attn_proj")(attn)

        # Caption cross attention on the RAW residual stream (the
        # reference skips attn2_norm under adaptive single-scale-shift).
        cq = nn.Dense(d, use_bias=self.attention_bias, name="cross_q")(x)
        ckv = nn.Dense(2 * d, use_bias=self.attention_bias, name="cross_kv")(y)
        ck, cv = jnp.split(ckv, 2, axis=-1)
        cq = RMSNorm(dim=d, eps=1e-5, name="cross_q_norm")(cq)
        ck = RMSNorm(dim=d, eps=1e-5, name="cross_k_norm")(ck)
        l = y.shape[1]
        if text_mask is not None:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk",
                to_heads(cq, n),
                to_heads(ck, l),
                preferred_element_type=jnp.float32,
            ) * (hd**-0.5)
            bias = jnp.where(
                text_mask[:, None, None, :].astype(bool), 0.0, -10000.0
            )
            w = jax.nn.softmax(logits + bias, axis=-1)
            cross = jnp.einsum(
                "bhqk,bhkd->bhqd", w.astype(cv.dtype), to_heads(cv, l)
            )
        else:
            cross = dot_product_attention(
                to_heads(cq, n), to_heads(ck, l), to_heads(cv, l)
            )
        cross = cross.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, name="cross_proj")(cross)

        h = self._norm(x)
        h = h * (1 + sc2[:, None]) + s2[:, None]
        h = nn.Dense(4 * d, name="ff1")(h)
        h = nn.Dense(d, name="ff2")(nn.gelu(h, approximate=True))
        return x + g2[:, None] * h


class LTXVideoTransformer(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        d = int(cfg.attention_head_dim) * int(cfg.num_attention_heads)
        self._dim = d
        self._num_heads = int(cfg.num_attention_heads)
        self._is_learned_sigma = bool(cfg.get("is_learned_sigma", False))
        self._out_channels = int(cfg.out_channels) * (
            2 if self._is_learned_sigma else 1
        )
        self._max_pos = tuple(
            cfg.get("positional_embedding_max_pos", [20, 2048, 2048])
        )
        self._rope_theta = float(cfg.get("positional_embedding_theta", 10000.0))
        self._norm_eps = float(cfg.get("norm_eps", 1e-6))
        self._rms_standardization = (
            str(cfg.get("standardization_norm", "rms_norm")) == "rms_norm"
        )

        self._proj_in = nn.Dense(d, name="proj_in")
        # PixArtAlphaTextProjection: linear_1 -> tanh-gelu -> linear_2
        # (reference embedding.py:676-705).
        self._caption_fc1 = nn.Dense(d, name="caption_fc1")
        self._caption_fc2 = nn.Dense(d, name="caption_fc2")
        self._t_block = nn.Dense(6 * d, name="t_block")
        self._t_fc1 = nn.Dense(d, name="t_fc1")
        self._t_fc2 = nn.Dense(d, name="t_fc2")
        self._blocks = [
            LTXBlock(
                dim=d,
                num_heads=self._num_heads,
                attention_bias=bool(cfg.get("attention_bias", True)),
                norm_eps=self._norm_eps,
                rms_standardization=self._rms_standardization,
                name=f"block_{i}",
            )
            for i in range(int(cfg.num_layers))
        ]
        self._num_layers = int(cfg.num_layers)
        # Final LayerNorm IS layer_norm in the reference regardless of
        # standardization_norm (ltx_video.py:133).
        self._final_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, name="final_norm"
        )
        self._final_table = self.param(
            "scale_shift_table",
            lambda key: jax.random.normal(key, (2, d)) / d**0.5,
        )
        self._proj_out = nn.Dense(
            self._out_channels,
            kernel_init=nn.initializers.zeros,
            name="proj_out",
        )
        # timestep_scale_multiplier (reference :360-361): LTX times are
        # continuous in [0,1]; the multiplier maps them onto the discrete
        # embedding frequency band.
        self._t_scale = float(cfg.get("timestep_scale_multiplier", 1000))

    def create_skip_layer_mask(
        self, skip_block_list, batch_size: int, num_conds: int, ptb_index: int
    ) -> np.ndarray:
        """STG helper (reference ltx_video.py:153-166): ones of shape
        (num_layers, batch*num_conds) with zeros at the perturbed-cond
        rows of the listed blocks. Usable outside apply (reads config)."""
        num_layers = int(self.config.num_layers)
        mask = np.ones((num_layers, batch_size * num_conds), np.float32)
        for block_idx in skip_block_list:
            mask[block_idx, ptb_index::num_conds] = 0.0
        return mask

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, F, H, W, C) latent grid."""
        b, f, h, w, c = x.shape
        tokens = self._proj_in(x.reshape(b, f * h * w, c))

        # Raw (frame, row, col) indices, fractionalized inside the rope.
        fi = jnp.repeat(jnp.arange(f), h * w)
        ri = jnp.tile(jnp.repeat(jnp.arange(h), w), f)
        ci = jnp.tile(jnp.arange(w), f * h)
        ids = jnp.stack([fi, ri, ci], axis=-1)
        cos, sin = ltx_rope_frequencies(
            ids, self._dim, self._max_pos, self._rope_theta
        )

        timestep = context["timestep"].astype(jnp.float32) * self._t_scale
        temb = self._t_fc2(
            nn.silu(self._t_fc1(glide_timestep_embedding(timestep, 256)))
        )
        shared_mod = self._t_block(nn.silu(temb)).reshape(b, 6, self._dim)
        y = context["text_embeddings"]
        if y.ndim == 4:  # reference layout (B, 1, L, C)
            y = y[:, 0]
        y = self._caption_fc2(nn.gelu(self._caption_fc1(y), approximate=True))
        text_mask = context.get("text_attention_mask")
        if text_mask is not None and text_mask.ndim > 2:
            text_mask = text_mask.reshape(b, -1)
        skip_layer_mask = context.get("skip_layer_mask")

        for i, block in enumerate(self._blocks):
            tokens = block(
                tokens, y, shared_mod, cos, sin,
                text_mask=text_mask,
                skip_mask=(
                    None if skip_layer_mask is None else skip_layer_mask[i]
                ),
                deterministic=deterministic,
            )

        final_mod = self._final_table[None] + temb[:, None]  # (B, 2, D)
        shift, scale = final_mod[:, 0], final_mod[:, 1]
        tokens = self._final_norm(tokens)
        tokens = tokens * (1 + scale[:, None]) + shift[:, None]
        out = self._proj_out(tokens).reshape(
            b, f, h, w, self._out_channels
        ).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
