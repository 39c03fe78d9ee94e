"""Sora (OpenSora STDiT3): spatial-temporal DiT for video.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/sora.py:26-465 (OpenSora's STDiT3): 3D patchify
(pt, ph, pw) -> `depth` PAIRS of [spatial attention within each frame,
temporal attention across frames], each block modulated by a per-block
scale_shift_table added to a SHARED t_block projection of the timestep
embedding (PixArt-style), T5 caption cross-attention in every block
(with optional text attention mask), qk RMS-norm, and rectified-flow
prediction.

Temporal conditioning mask (x_mask, reference :121-180): when
context["video_mask"] marks conditioned frames, those frames are
modulated with the TIMESTEP-ZERO embedding (t0) in every block and in
the final layer — conditioned frames are processed as clean data while
generated frames follow the sampled timestep.

TPU note: spatial and temporal attentions are pure reshapes between
(B*F, N, D) and (B*N, F, D) token layouts — no data movement beyond the
relayout XLA already fuses.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import (
    glide_timestep_embedding,
    sincos_position_embedding_2d,
)
from xdiffusion_tpu.layers.norm import RMSNorm
from xdiffusion_tpu.ops import dot_product_attention


def _t2i_modulate(x, shift, scale):
    # shift/scale: (B, 1, D) slices of the scale-shift table sum.
    return x * (1.0 + scale) + shift


def _rotary(t: jax.Array) -> jax.Array:
    """lucidrains-style rotary embedding over the sequence axis of a
    (B, H, N, D) tensor: interleaved pairs, freqs 1/10000^(2i/D)
    (reference layers/rope.py:83-186, applied to temporal q/k after the
    qk norm — score_networks/sora.py:260). Odd D rotates only the first
    2*(D//2) dims and passes the tail through (apply_rotary_emb's
    start/end-index split)."""
    n, d = t.shape[-2], t.shape[-1]
    half = d // 2
    base = 1.0 / (
        10000.0 ** (jnp.arange(0, d, 2, dtype=jnp.float32)[:half] / d)
    )
    f = jnp.arange(n, dtype=jnp.float32)[:, None] * base[None]  # (N, D//2)
    cos = jnp.repeat(jnp.cos(f), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(f), 2, axis=-1)
    head, tail = t[..., : 2 * half], t[..., 2 * half :]
    x = head.reshape(*head.shape[:-1], half, 2)
    rot = jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(head.shape)
    out = head * cos + rot * sin
    return jnp.concatenate([out, tail], axis=-1).astype(t.dtype)


class STAttention(nn.Module):
    """Self attention with optional qk RMS-norm and rotary embedding
    (temporal blocks rotate q/k over the frame axis)."""

    num_heads: int
    qk_norm: bool = True
    rope: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, name="qkv")(x)
        q, k, v = (
            t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        if self.qk_norm:
            q = RMSNorm(dim=hd, name="q_norm")(q)
            k = RMSNorm(dim=hd, name="k_norm")(k)
        if self.rope:
            q = _rotary(q)
            k = _rotary(k)
        out = dot_product_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class CaptionCrossAttention(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        y: jax.Array,
        text_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, n, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, name="q")(x)
        kv = nn.Dense(2 * c, name="kv")(y)
        k, v = jnp.split(kv, 2, axis=-1)
        to_heads = lambda t, l: t.reshape(b, l, self.num_heads, hd).transpose(
            0, 2, 1, 3
        )
        qh = to_heads(q, n)
        kh = to_heads(k, y.shape[1])
        vh = to_heads(v, y.shape[1])
        if text_mask is not None:
            # Mask padded caption tokens out of the kv sequence
            # (reference y_lens path).
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            bias = jnp.where(
                text_mask[:, None, None, :].astype(bool),
                0.0,
                jnp.finfo(jnp.float32).min,
            )
            w = jax.nn.softmax(logits + bias, axis=-1).astype(vh.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        else:
            out = dot_product_attention(qh, kh, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class STDiTBlock(nn.Module):
    """One spatial-or-temporal STDiT3 block (reference: sora.py:26-180):
    per-block scale_shift_table + shared t_block modulation, optional
    per-frame t/t0 modulation select, caption cross attention."""

    hidden_size: int
    num_heads: int
    temporal: bool = False
    mlp_ratio: float = 4.0
    qk_norm: bool = True
    rope: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        y,
        t6,
        num_frames: int,
        t6_zero=None,
        frame_mask=None,
        text_mask=None,
        deterministic=True,
    ):
        # x: (B, F*N, D); t6/t6_zero: (B, 6*D) shared t_block outputs;
        # frame_mask: (B, F) True = generate (use t), False = conditioned
        # (use t0).
        b, fn, d = x.shape
        f = num_frames
        n = fn // f
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=d**-0.5),
            (6, d),
        )

        def mods(t_vec):
            m = table[None] + t_vec.reshape(b, 6, d)
            return [m[:, i][:, None] for i in range(6)]  # each (B, 1, D)

        s1, sc1, g1, s2, sc2, g2 = mods(t6)
        masked = frame_mask is not None and t6_zero is not None
        if masked:
            z1, zc1, zg1, z2, zc2, zg2 = mods(t6_zero)
            sel = frame_mask[:, :, None, None].astype(bool)  # (B, F, 1, 1)

            def frame_select(a, a_zero):
                a4 = a.reshape(b, f, n, d)
                z4 = a_zero.reshape(b, f, n, d)
                return jnp.where(sel, a4, z4).reshape(b, fn, d)

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm1")(x)
        hm = _t2i_modulate(h, s1, sc1)
        if masked:
            hm = frame_select(hm, _t2i_modulate(h, z1, zc1))
        if self.temporal:
            # (B, F, N, D) -> (B*N, F, D): frames attend at each location.
            hm = hm.reshape(b, f, n, d).transpose(0, 2, 1, 3).reshape(b * n, f, d)
            hm = STAttention(
                num_heads=self.num_heads, qk_norm=self.qk_norm,
                rope=self.rope, name="attn",
            )(hm)
            hm = hm.reshape(b, n, f, d).transpose(0, 2, 1, 3).reshape(b, fn, d)
        else:
            # (B*F, N, D): spatial attention within each frame.
            hm = hm.reshape(b * f, n, d)
            hm = STAttention(
                num_heads=self.num_heads, qk_norm=self.qk_norm,
                rope=self.rope, name="attn",
            )(hm)
            hm = hm.reshape(b, fn, d)
        gated = g1 * hm
        if masked:
            gated = frame_select(gated, zg1 * hm)
        x = x + gated

        # Caption cross attention (every block).
        x = x + CaptionCrossAttention(
            num_heads=self.num_heads, name="cross_attn"
        )(x, y, text_mask)

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x)
        hm = _t2i_modulate(h, s2, sc2)
        if masked:
            hm = frame_select(hm, _t2i_modulate(h, z2, zc2))
        hm = nn.Dense(int(d * self.mlp_ratio), name="mlp1")(hm)
        hm = nn.Dense(d, name="mlp2")(nn.gelu(hm, approximate=True))
        gated = g2 * hm
        if masked:
            gated = frame_select(gated, zg2 * hm)
        return x + gated


class Sora(nn.Module):
    """Instantiated with the score_network params block as a DotConfig."""

    config: Any

    def setup(self):
        cfg = self.config
        self._patch = tuple(cfg.patch_size)  # (pt, ph, pw)
        d = int(cfg.hidden_size)
        self._dim = d
        self._num_heads = int(cfg.num_heads)
        self._is_learned_sigma = bool(cfg.get("pred_sigma", False))
        self._in_channels = int(cfg.input_channels)
        self._out_channels = self._in_channels * (
            2 if self._is_learned_sigma else 1
        )
        size = list(cfg.input_size)  # (F, H, W)
        self._input_size = size
        pt, ph, pw = self._patch
        self._grid = (size[0] // pt, size[1] // ph, size[2] // pw)

        self._x_embedder = nn.Dense(d, name="x_embedder")
        # PositionEmbedding2D semantics (reference layers/sora.py:648-697
        # driven by score_networks/sora.py:376-382): positions scaled by
        # base_size/grid and divided by resolution_sq/input_sq_size.
        import math as _math

        res_sq = _math.sqrt(float(size[1]) * float(size[2]))
        pos_scale = res_sq / float(cfg.get("input_sq_size", res_sq))
        s_tokens = self._grid[1] * self._grid[2]
        self._pos_spatial = sincos_position_embedding_2d(
            d,
            self._grid[1],
            self._grid[2],
            base_size=round(s_tokens**0.5),
            lewei_scale=pos_scale,
        )
        self._t_fc1 = nn.Dense(d, name="t_fc1")
        self._t_fc2 = nn.Dense(d, name="t_fc2")
        # Shared 6D modulation projection (reference t_block); per-block
        # scale_shift_table params add to its output.
        self._t_block = nn.Dense(6 * d, name="t_block")
        # CaptionEmbedder y_proj: fc1 -> tanh-gelu -> fc2 (reference
        # layers/sora.py:600-645).
        self._y_fc1 = nn.Dense(d, name="y_fc1")
        self._y_fc2 = nn.Dense(d, name="y_fc2")

        # `depth` PAIRS of (spatial, temporal) blocks (reference builds
        # spatial_blocks and temporal_blocks each of length depth).
        blocks = []
        for i in range(int(cfg.depth)):
            blocks.append(
                (
                    STDiTBlock(
                        hidden_size=d,
                        num_heads=self._num_heads,
                        temporal=False,
                        mlp_ratio=float(cfg.mlp_ratio),
                        qk_norm=bool(cfg.get("qk_norm", True)),
                        name=f"spatial_{i}",
                    ),
                    STDiTBlock(
                        hidden_size=d,
                        num_heads=self._num_heads,
                        temporal=True,
                        mlp_ratio=float(cfg.mlp_ratio),
                        qk_norm=bool(cfg.get("qk_norm", True)),
                        rope=True,
                        name=f"temporal_{i}",
                    ),
                )
            )
        self._blocks = blocks
        self._final_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, name="final_norm"
        )
        pt, ph, pw = self._patch
        self._final_proj = nn.Dense(
            pt * ph * pw * self._out_channels,
            kernel_init=nn.initializers.zeros,
            name="final_proj",
        )
        self._final_table = self.param(
            "final_scale_shift_table",
            nn.initializers.normal(stddev=d**-0.5),
            (2, d),
        )

    def _temb(self, timestep: jax.Array) -> jax.Array:
        # DiT TimestepEmbedder features: cos-first, `half` freq divisor,
        # raw (unscaled) timesteps (reference layers/sora.py:496-520).
        return self._t_fc2(
            nn.silu(self._t_fc1(glide_timestep_embedding(timestep, 256)))
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, F, H, W, C)."""
        b, f, hh, ww, c = x.shape
        pt, ph, pw = self._patch
        gf, gh, gw = f // pt, hh // ph, ww // pw

        # 3D patchify -> (B, gf*gh*gw, C*pt*ph*pw).
        tokens = x.reshape(b, gf, pt, gh, ph, gw, pw, c)
        tokens = tokens.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        tokens = tokens.reshape(b, gf * gh * gw, c * pt * ph * pw)
        tokens = self._x_embedder(tokens)
        # Spatial positional encoding tiled over frames.
        pos = jnp.tile(self._pos_spatial, (gf, 1))
        tokens = tokens + pos[None]

        timestep = context["timestep"].astype(jnp.float32)
        temb = self._temb(timestep)
        t6 = self._t_block(nn.silu(temb))
        y = context["text_embeddings"]
        if y.ndim == 4:  # reference layout (B, 1, L, C)
            y = y[:, 0]
        y = self._y_fc2(nn.gelu(self._y_fc1(y), approximate=True))
        text_mask = context.get("text_attention_mask")

        # Temporal conditioning mask: True = generate. Only meaningful when
        # frames align with token frames (pt == 1, the shipped configs).
        frame_mask = None
        t6_zero = None
        temb_zero = None
        vm = context.get("video_mask")
        if vm is not None and pt == 1:
            frame_mask = vm[:, :gf]
            temb_zero = self._temb(jnp.zeros_like(timestep))
            t6_zero = self._t_block(nn.silu(temb_zero))

        for spatial, temporal in self._blocks:
            tokens = spatial(
                tokens, y, t6, gf,
                t6_zero=t6_zero, frame_mask=frame_mask, text_mask=text_mask,
                deterministic=deterministic,
            )
            tokens = temporal(
                tokens, y, t6, gf,
                t6_zero=t6_zero, frame_mask=frame_mask, text_mask=text_mask,
                deterministic=deterministic,
            )

        # Final layer: scale_shift_table(2, D) + raw temb, with the same
        # per-frame t/t0 select (reference T2IFinalLayer).
        d = self._dim
        final_table = self._final_table

        def final_mod(t_vec):
            m = final_table[None] + t_vec.reshape(b, 1, d)
            shift = m[:, 0][:, None]
            scale = m[:, 1][:, None]  # table rows: (shift, scale)
            return shift, scale

        h = self._final_norm(tokens)
        shift, scale = final_mod(temb)
        out_tokens = _t2i_modulate(h, shift, scale)
        if frame_mask is not None and temb_zero is not None:
            z_shift, z_scale = final_mod(temb_zero)
            # Reference quirk, reproduced intentionally: T2IFinalLayer
            # reassigns `x` before computing the zero branch (reference
            # layers/sora.py:466-471), so the t0 modulation applies to the
            # re-NORMED already-t-modulated tokens, not the raw hidden.
            alt = _t2i_modulate(self._final_norm(out_tokens), z_shift, z_scale)
            sel = frame_mask[:, :, None, None].astype(bool)
            n_sp = gh * gw
            out_tokens = jnp.where(
                sel,
                out_tokens.reshape(b, gf, n_sp, d),
                alt.reshape(b, gf, n_sp, d),
            ).reshape(b, gf * n_sp, d)
        tokens = self._final_proj(out_tokens)

        oc = self._out_channels
        out = tokens.reshape(b, gf, gh, gw, pt, ph, pw, oc)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        out = out.reshape(b, f, hh, ww, oc).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
