"""HunyuanVideo: MM-DiT double/single stream video transformer.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/hunyuan_video.py:39-726 + layers/hunyuan_video/*
(HunyuanVideo, arXiv:2412.03603): 3D-patchified video latents and refined
text tokens flow through double-stream (separate weights, joint attention)
then single-stream blocks — the Flux block grammar over video tokens with
3-axis RoPE (frame, row, col), qk RMS-norm, and a timestep-conditioned
single-refiner over the text states; conditioning vec = timestep embedding
+ pooled CLIP projection.

Reuses the Flux Double/SingleStreamBlocks (identical math).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from typing import Optional

from xdiffusion_tpu.layers.embedding import glide_timestep_embedding
from xdiffusion_tpu.layers.flux import (
    DoubleStreamBlock,
    LastLayer,
    MLPEmbedder,
    SingleStreamBlock,
    rope_frequencies,
)
from xdiffusion_tpu.ops import dot_product_attention


class SingleTokenRefiner(nn.Module):
    """Faithful SingleTokenRefiner (reference layers/hunyuan_video/
    token_refiner.py:15-227): the LLM text states are projected and run
    through `depth` adaLN-GATED transformer blocks whose conditioning
    c = TimestepEmbedder(t) + TextProjection(mask-weighted mean of the
    RAW text states). Affine LayerNorms (eps 1e-6), SiLU MLPs, and a
    padding-aware self-attention mask whose first column is forced open
    so fully-padded rows don't NaN."""

    hidden_size: int
    num_heads: int
    depth: int = 2

    @nn.compact
    def __call__(
        self,
        text_states: jax.Array,  # (B, L, C_text)
        t: jax.Array,  # (B,) raw timesteps
        mask: Optional[jax.Array] = None,  # (B, L) 1 = valid
    ) -> jax.Array:
        d = self.hidden_size
        b, l, _ = text_states.shape
        hd = d // self.num_heads

        temb = nn.Dense(d, name="t_fc2")(
            nn.silu(
                nn.Dense(d, name="t_fc1")(
                    glide_timestep_embedding(t.astype(jnp.float32), 256)
                )
            )
        )
        if mask is None:
            ctx = jnp.mean(text_states, axis=1)
        else:
            mf = mask.astype(jnp.float32)[:, :, None]
            ctx = jnp.sum(text_states * mf, axis=1) / (
                jnp.sum(mf, axis=1) + 1e-8
            )
        ctx = nn.Dense(d, name="c_fc2")(
            nn.silu(nn.Dense(d, name="c_fc1")(ctx))
        )
        c = temb + ctx

        attn_bias = None
        if mask is not None:
            valid = mask.astype(bool)
            keep = valid[:, :, None] & valid[:, None, :]  # (B, L, L)
            keep = keep.at[:, :, 0].set(True)
            attn_bias = jnp.where(keep[:, None], 0.0, -jnp.inf).astype(
                jnp.float32
            )

        x = nn.Dense(d, name="input_embedder")(text_states)
        for i in range(self.depth):
            gates = nn.Dense(
                2 * d, kernel_init=nn.initializers.zeros, name=f"adaLN_{i}"
            )(nn.silu(c))
            g1, g2 = jnp.split(gates, 2, axis=-1)
            h = nn.LayerNorm(epsilon=1e-6, name=f"norm1_{i}")(x)
            qkv = nn.Dense(3 * d, name=f"qkv_{i}")(h)
            q, k, v = (
                t_.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)
                for t_ in jnp.split(qkv, 3, axis=-1)
            )
            if attn_bias is not None:
                logits = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k,
                    preferred_element_type=jnp.float32,
                ) * (hd**-0.5)
                w = jax.nn.softmax(logits + attn_bias, axis=-1)
                attn = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
            else:
                attn = dot_product_attention(q, k, v)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, l, d)
            x = x + g1[:, None] * nn.Dense(d, name=f"proj_{i}")(attn)
            h = nn.LayerNorm(epsilon=1e-6, name=f"norm2_{i}")(x)
            h = nn.Dense(4 * d, name=f"mlp1_{i}")(h)
            h = nn.Dense(d, name=f"mlp2_{i}")(nn.silu(h))
            x = x + g2[:, None] * h
        return x


class HYVideoDiffusionTransformer(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        d = int(cfg.hidden_size)
        self._dim = d
        self._num_heads = int(cfg.heads_num)
        self._patch = tuple(cfg.patch_size)  # (pt, ph, pw)
        self._rope_dims = tuple(cfg.rope_dim_list)
        assert sum(self._rope_dims) == d // self._num_heads
        self._is_learned_sigma = bool(cfg.get("is_learned_sigma", False))
        self._out_channels = int(cfg.out_channels) * (
            2 if self._is_learned_sigma else 1
        )
        pt, ph, pw = self._patch
        self._token_dim = int(cfg.in_channels) * pt * ph * pw

        self._img_in = nn.Dense(d, name="img_in")
        self._time_in = MLPEmbedder(hidden_dim=d, name="time_in")
        self._vector_in = MLPEmbedder(hidden_dim=d, name="vector_in")
        self._refiner = SingleTokenRefiner(
            hidden_size=d,
            num_heads=self._num_heads,
            depth=2,
            name="txt_refiner",
        )
        self._use_attention_mask = bool(cfg.get("use_attention_mask", True))
        mlp_ratio = float(cfg.get("mlp_width_ratio", 4.0))
        self._double_blocks = [
            DoubleStreamBlock(
                hidden_size=d,
                num_heads=self._num_heads,
                mlp_ratio=mlp_ratio,
                qkv_bias=bool(cfg.get("qkv_bias", True)),
                name=f"double_{i}",
            )
            for i in range(int(cfg.mm_double_blocks_depth))
        ]
        self._single_blocks = [
            SingleStreamBlock(
                hidden_size=d,
                num_heads=self._num_heads,
                mlp_ratio=mlp_ratio,
                name=f"single_{i}",
            )
            for i in range(int(cfg.mm_single_blocks_depth))
        ]
        self._final = LastLayer(
            hidden_size=d,
            out_dim=self._patch[0] * self._patch[1] * self._patch[2]
            * self._out_channels,
            name="final",
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, F, H, W, C) latent grid."""
        b, f, hh, ww, c = x.shape
        pt, ph, pw = self._patch
        gf, gh, gw = f // pt, hh // ph, ww // pw

        img = x.reshape(b, gf, pt, gh, ph, gw, pw, c)
        img = img.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        img = img.reshape(b, gf * gh * gw, c * pt * ph * pw)
        img = self._img_in(img)

        fi = jnp.repeat(jnp.arange(gf), gh * gw)
        ri = jnp.tile(jnp.repeat(jnp.arange(gh), gw), gf)
        ci = jnp.tile(jnp.arange(gw), gf * gh)
        img_ids = jnp.stack([fi, ri, ci], axis=-1).astype(jnp.float32)
        img_ids = jnp.broadcast_to(img_ids[None], (b, gf * gh * gw, 3))

        timestep = context["timestep"].astype(jnp.float32)
        # TimestepEmbedder features: cos-first glide sinusoid on the raw
        # timesteps (reference layers/hunyuan_video/embedding.py:87-149).
        vec = self._time_in(glide_timestep_embedding(timestep, 256))
        # Accept both our canonical keys and the reference context keys
        # (reference score_networks/hunyuan_video.py:589-595).
        clip_pooled = context.get(
            "clip_text_embeddings", context.get("hv_clip_embeddings")
        )
        if clip_pooled is not None:
            vec = vec + self._vector_in(clip_pooled)

        text_states = context.get(
            "text_embeddings", context.get("hv_llm_embeddings")
        )
        text_mask = context.get(
            "text_attention_mask",
            context.get("hv_llm_embeddings_attention_mask"),
        )
        txt = self._refiner(
            text_states,
            timestep,
            text_mask if self._use_attention_mask else None,
        )  # (B, L, hidden)
        txt_ids = jnp.zeros((b, txt.shape[1], 3), dtype=jnp.float32)

        # RoPE tables: the reference receives them precomputed via the
        # RopeFrequencies context preprocessor (rope.py:304-359, theta
        # from config — the shipped config uses 256); accept that contract
        # and fall back to internal computation. Context tables cover the
        # img tokens only (interleave-doubled torch layout) — txt tokens
        # ride along with identity rotation, matching the reference,
        # which rotates only the img stream.
        rope_cos = context.get("rope_frequencies_cos")
        if rope_cos is not None:
            rope_sin = context["rope_frequencies_sin"]
            img_cos = jnp.asarray(rope_cos)[..., 0::2]  # (N_img, hd//2)
            img_sin = jnp.asarray(rope_sin)[..., 0::2]
            n_txt = txt.shape[1]
            cos = jnp.concatenate(
                [jnp.ones((n_txt, img_cos.shape[-1]), img_cos.dtype), img_cos]
            )[None]
            sin = jnp.concatenate(
                [jnp.zeros((n_txt, img_sin.shape[-1]), img_sin.dtype), img_sin]
            )[None]
            cos = jnp.broadcast_to(cos, (b, *cos.shape[1:]))
            sin = jnp.broadcast_to(sin, (b, *sin.shape[1:]))
        else:
            ids = jnp.concatenate([txt_ids, img_ids], axis=1)
            cos, sin = rope_frequencies(
                ids,
                self._rope_dims,
                float(self.config.get("rope_theta", 256.0)),
            )

        for block in self._double_blocks:
            img, txt = block(img, txt, vec, cos, sin, deterministic=deterministic)
        merged = jnp.concatenate([txt, img], axis=1)
        for block in self._single_blocks:
            merged = block(merged, vec, cos, sin, deterministic=deterministic)
        img = merged[:, txt.shape[1] :]

        img = self._final(img, vec)
        oc = self._out_channels
        # Hunyuan's unpatchify reads the final-layer features CHANNEL-
        # FIRST — reshape (..., c, pt, ph, pw), einsum nthwcopq->nctohpwq
        # (reference score_networks/hunyuan_video.py:688-701) — unlike
        # Sora/DiT's channel-last convention.
        out = img.reshape(b, gf, gh, gw, oc, pt, ph, pw)
        out = out.transpose(0, 1, 5, 2, 6, 3, 7, 4)
        out = out.reshape(b, f, hh, ww, oc).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
