"""Attention blocks over spatial feature maps and token sequences.

Counterpart of the reference attention layers
(/root/reference/xdiffusion/layers/attention.py:20-380). All attention
math routes through `xdiffusion_tpu.ops.dot_product_attention`, which
dispatches between a Pallas flash kernel and a fused XLA path.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.ops import attention_bshd, attention_qkv, dot_product_attention  # noqa: F401 (attention_bshd re-exported for long-seq callers)


class SpatialCrossAttention(nn.Module):
    """Self/cross attention over the spatial positions of an NHWC map.

    With context_dim in (None, -1) this is multi-head self attention;
    otherwise keys/values additionally attend over a (B, L, context_dim)
    conditioning sequence found at context["text_embeddings"]
    (GLIDE-style encoder kv, reference: layers/attention.py:20-143).

    heads is derived as channels // dim_head unless dim_head == -1, in
    which case `heads` is used directly (reference semantics).
    """

    in_channels: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    is_causal: bool = False
    context_key: str = "text_embeddings"
    # Optional {target:, params:} block selecting which context signal
    # feeds the encoder kv (reference: attention.py:80-84).
    context_adapter: Optional[dict] = None
    # LayerNorm the conditioning sequence before the encoder kv projection
    # (Imagen's Efficient UNet cross-attention does this).
    context_layer_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[Dict] = None, deterministic: bool = True
    ) -> jax.Array:
        b, h, w, c = x.shape
        assert c == self.in_channels
        if self.dim_head == -1:
            num_heads = self.heads
        else:
            assert c % self.dim_head == 0, (
                f"channels {c} not divisible by dim_head {self.dim_head}"
            )
            num_heads = c // self.dim_head
        head_dim = c // num_heads

        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        groups = 32 if c % 32 == 0 else max(1, c // 4)
        hidden = FastGroupNorm(num_groups=groups, dtype=self.dtype, name="norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        context_dim = None if self.context_dim in (None, -1) else self.context_dim
        if context_dim is not None and context is not None:
            if self.context_adapter and "target" in self.context_adapter:
                from xdiffusion_tpu.config import instantiate_from_config

                adapter = instantiate_from_config(dict(self.context_adapter))
                enc = adapter(context)
            else:
                enc = context.get(self.context_key, context.get("context_embedding"))
            assert enc is not None, "cross-attention needs a context sequence"
            if self.context_layer_norm:
                # Reference ChanLayerNorm: gain-only (no bias), eps 1e-5
                # (layers/attention.py:286-310) over the channel axis.
                enc = nn.LayerNorm(
                    use_bias=False, epsilon=1e-5, dtype=self.dtype,
                    name="context_norm",
                )(enc)
            enc_kv = nn.Dense(2 * c, dtype=self.dtype, name="encoder_kv")(enc)
            ek, ev = jnp.split(enc_kv, 2, axis=-1)
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([ev, v], axis=1)

        out = attention_qkv(q, k, v, heads=num_heads, is_causal=self.is_causal)
        out = nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="proj_out"
        )(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return x + out.reshape(b, h, w, c)


class TemporalSelfAttention(nn.Module):
    """Self attention over the frame axis of a (B, F, H, W, C) video map.

    Counterpart of the reference TemporalSelfAttention
    (layers/attention.py:383-490): spatial positions are folded into the
    batch, frames attend to each other with a learned per-head relative
    position bias (tensor2tensor style), zero-init output projection.
    """

    in_channels: int
    temporal_sequence_length: int = 16
    max_relative_position: int = 16
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[Dict] = None, deterministic: bool = True
    ) -> jax.Array:
        b, f, h, w, c = x.shape
        assert c == self.in_channels
        if self.dim_head == -1:
            num_heads = self.heads
        else:
            assert c % self.dim_head == 0
            num_heads = c // self.dim_head
        head_dim = c // num_heads

        groups = 32 if c % 32 == 0 else max(1, c // 4)
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        # Fold spatial into batch FIRST: the reference norms the already
        # rearranged "(b h w) c f" tensor (unet_3d.py:157-165), so the
        # GroupNorm statistics are per spatial position over
        # (channel-group, frames) — not over the whole 5D map.
        hidden = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        hidden = FastGroupNorm(
            num_groups=groups, dtype=self.dtype, name="norm"
        )(hidden)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        to_heads = lambda t: t.reshape(
            b * h * w, f, num_heads, head_dim
        ).transpose(0, 2, 1, 3)
        q, k, v = to_heads(q), to_heads(k), to_heads(v)

        # tensor2tensor relative-position *embeddings* (reference
        # QKVAttentionWithRelativePosition, attention.py:490-676): per-head
        # (2M-1, head_dim) tables; logits gain q . rel_k[j - i]. The v
        # table is allocated for checkpoint-shape fidelity but — like the
        # reference, which calls the t2t kernel with
        # add_relative_to_values=False — never used in the forward. Note
        # the reference applies NO 1/sqrt(d) scaling in this kernel; we
        # reproduce that exactly (imported weights were trained with it).
        max_rel = self.max_relative_position
        init = nn.initializers.normal(stddev=head_dim**-0.5)
        rel_k = self.param(
            "rel_k_embeddings", init, (num_heads, 2 * max_rel - 1, head_dim)
        )
        self.param(
            "rel_v_embeddings", init, (num_heads, 2 * max_rel - 1, head_dim)
        )
        if context is not None and "frame_indices" in context:
            # FDM-style arbitrary temporal positions (reference
            # attention.py:910-1090): offsets from explicit frame indices.
            fi = context["frame_indices"][:, :f].astype(jnp.int32)  # (B, F)
            rel = jnp.clip(
                fi[:, None, :] - fi[:, :, None], -(max_rel - 1), max_rel - 1
            ) + (max_rel - 1)  # (B, F, F) of j - i
            rel = jnp.repeat(rel, h * w, axis=0)  # fold spatial into batch
            rel_e = jnp.take(rel_k, rel, axis=1)  # (H, BHW, F, F, D)
            rel_logits = jnp.einsum(
                "bhqd,hbqkd->bhqk", q, rel_e,
                preferred_element_type=jnp.float32,
            )
        else:
            idx = jnp.arange(f)
            rel = jnp.clip(
                idx[None, :] - idx[:, None], -(max_rel - 1), max_rel - 1
            ) + (max_rel - 1)  # (F, F) of j - i
            rel_e = jnp.take(rel_k, rel, axis=1)  # (H, F, F, D)
            rel_logits = jnp.einsum(
                "bhqd,hqkd->bhqk", q, rel_e,
                preferred_element_type=jnp.float32,
            )

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        logits = logits + rel_logits
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)  # (BHW, H, F, D)
        # Reference quirk, reproduced intentionally: QKVAttentionWith-
        # RelativePosition returns `a.reshape(B, -1, L)` on a (B, H, L, D)
        # tensor WITHOUT permuting (reference attention.py:594), so frames
        # and head-channels scramble before the output projection — the
        # projection weights are trained against that layout, so imported
        # checkpoints only reproduce with the same view.
        out = out.reshape(b * h * w, c, f).transpose(0, 2, 1)
        out = nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="proj_out"
        )(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = out.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return x + out


class MultiHeadSelfAttention(nn.Module):
    """Token-sequence MHSA used by DiT-family transformers
    (reference: layers/attention.py:313-380)."""

    num_heads: int
    qkv_bias: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        b, n, c = x.shape
        assert c % self.num_heads == 0
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = attention_qkv(q, k, v, heads=self.num_heads)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class SpatialAndTemporalCrossAttention(nn.Module):
    """Combined spatial cross-attention + temporal self-attention block
    (reference: layers/attention.py:756 — Make-A-Video's fused attention).

    Designed for the video UNets' *spatial* layer slot, which runs on
    frame-folded (B*F, H, W, C) maps: the spatial half runs folded, then
    frames are statically recovered from `temporal_sequence_length` for
    the temporal half. Both halves are residual with zero-init output
    projections, so the block starts as the identity.
    """

    in_channels: int
    temporal_sequence_length: int = 16
    max_relative_position: int = 16
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    is_video: bool = True
    # Accepted for reference-config compatibility.
    pre_layer_norm: bool = False
    post_layer_norm: bool = False
    context_layer_norm: bool = False
    context_adapter: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[Dict] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        x = SpatialCrossAttention(
            in_channels=self.in_channels,
            context_dim=self.context_dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            context_layer_norm=self.context_layer_norm,
            context_adapter=self.context_adapter,
            dtype=self.dtype,
            name="spatial",
        )(x, context=context, deterministic=deterministic)
        if not self.is_video:
            return x
        bf, h, w, c = x.shape
        f = self.temporal_sequence_length
        video = x.reshape(bf // f, f, h, w, c)
        video = TemporalSelfAttention(
            in_channels=self.in_channels,
            temporal_sequence_length=f,
            max_relative_position=self.max_relative_position,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            dtype=self.dtype,
            name="temporal",
        )(video, context=None, deterministic=deterministic)
        return video.reshape(bf, h, w, c)


class RPENet(nn.Module):
    """Relative-position encoder conditioned on the diffusion time
    (reference: layers/attention.py:910-938 — FDM's iRPE network).

    Maps (log-bucketed) signed frame distances + the timestep embedding
    to per-head relative-position features; zero-init output so attention
    starts unbiased."""

    channels: int
    num_heads: int

    @nn.compact
    def __call__(
        self, temb: jax.Array, relative_distances: jax.Array
    ) -> jax.Array:
        # temb: (B, T, tdim); relative_distances: (B, T, T) signed ints.
        rel = relative_distances.astype(jnp.float32)
        dist_embs = jnp.stack(
            [
                jnp.log1p(jnp.clip(rel, 0, None)),
                jnp.log1p(jnp.clip(-rel, 0, None)),
                (rel == 0).astype(jnp.float32),
            ],
            axis=-1,
        )  # (B, T, T, 3)
        emb = (
            nn.Dense(self.channels, name="embed_diffusion_time")(temb)[
                :, :, None
            ]
            + nn.Dense(self.channels, name="embed_distances")(dist_embs)
        )
        out = nn.Dense(
            self.channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="out",
        )(nn.silu(emb))
        b, t, _, _ = out.shape
        hd = self.channels // self.num_heads
        return out.reshape(b, t, t, self.num_heads, hd)


class RPEAttention(nn.Module):
    """Attention with iRPE relative-position terms on q/k/v (reference:
    layers/attention.py:992-1090, from FDM). Tokens: (B, D, T, C) where D
    is a folded free axis (spatial positions for temporal attention,
    frames for spatial attention); the RPE terms act over T using
    EXPLICIT per-frame indices from the context.

    attn_mask (B, T) groups tokens: mask==1 tokens attend among
    themselves, mask==0 among themselves, never across (the FDM
    observed/latent split, reference attention.py:1056-1076)."""

    channels: int
    num_heads: int
    time_embed_dim: Optional[int] = None
    use_rpe_net: bool = False
    use_rpe_q: bool = True
    use_rpe_k: bool = True
    use_rpe_v: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: Optional[jax.Array] = None,
        frame_indices: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, d, t, c = x.shape
        h = self.num_heads
        hd = c // h
        any_rpe = self.use_rpe_q or self.use_rpe_k or self.use_rpe_v
        if any_rpe and not self.use_rpe_net:
            raise NotImplementedError(
                "lookup-table RPE is unused by the reference configs; "
                "use use_rpe_net=True"
            )

        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        groups = 32 if c % 32 == 0 else max(1, c // 4)
        hidden = FastGroupNorm(num_groups=groups, name="norm")(
            x.reshape(b * d, t, c)
        ).reshape(b, d, t, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(hidden)
        qkv = qkv.reshape(b, d, t, 3, h, hd)
        q, k, v = (qkv[..., i, :, :].transpose(0, 1, 3, 2, 4) for i in range(3))
        # q, k, v: (B, D, H, T, hd)
        scale = hd**-0.5
        q = q * scale
        attn = jnp.einsum(
            "bdhtf,bdhsf->bdhts", q, k, preferred_element_type=jnp.float32
        )

        if any_rpe:
            assert frame_indices is not None, "RPE needs frame_indices"
            rel = (
                frame_indices[:, :, None] - frame_indices[:, None, :]
            ).astype(jnp.int32)  # (B, T, T)
            if self.use_rpe_k:
                r_k = RPENet(self.channels, h, name="rpe_k")(temb, rel)
                attn = attn + jnp.einsum("bdhtf,btshf->bdhts", q, r_k)
            if self.use_rpe_q:
                r_q = RPENet(self.channels, h, name="rpe_q")(temb, rel)
                attn = attn + jnp.einsum(
                    "bdhtf,btshf->bdhts", k * scale, r_q
                ).transpose(0, 1, 2, 4, 3)

        if attn_mask is not None:
            m = attn_mask.astype(jnp.float32)
            allowed = m[:, None, :] * m[:, :, None] + (1 - m[:, None, :]) * (
                1 - m[:, :, None]
            )
            attn = attn + jnp.where(allowed > 0, 0.0, -jnp.inf)[
                :, None, None
            ]

        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bdhts,bdhsf->bdhtf", attn, v)
        if self.use_rpe_v:
            r_v = RPENet(self.channels, h, name="rpe_v")(
                temb,
                (frame_indices[:, :, None] - frame_indices[:, None, :]).astype(
                    jnp.int32
                ),
            )
            out = out + jnp.einsum("bdhts,btshf->bdhtf", attn, r_v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, d, t, c)
        out = nn.Dense(
            c,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj_out",
        )(out)
        return hidden + out


class FactorizedAttentionBlock(nn.Module):
    """FDM space/time factorized attention (reference: score_networks/
    unet_factorized3d.py:148-195): temporal RPE attention over frames at
    each spatial position (observed/latent group mask), then plain
    attention over spatial positions within each frame."""

    channels: int
    num_heads: int
    time_embed_dim: int
    use_rpe_net: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B*T, H, W, C)
        temb: jax.Array,  # (B, T, time_embed_dim)
        frame_indices: jax.Array,  # (B, T)
        attn_mask: Optional[jax.Array],  # (B, T)
        frames: int,
    ) -> jax.Array:
        bt, hh, ww, c = x.shape
        t = frames
        b = bt // t
        tokens = x.reshape(b, t, hh * ww, c)
        # Temporal: spatial positions fold into D.
        temporal_in = tokens.transpose(0, 2, 1, 3)  # (B, HW, T, C)
        temporal_out = RPEAttention(
            channels=c,
            num_heads=self.num_heads,
            time_embed_dim=self.time_embed_dim,
            use_rpe_net=self.use_rpe_net,
            dtype=self.dtype,
            name="temporal_attention",
        )(temporal_in, temb=temb, frame_indices=frame_indices,
          attn_mask=attn_mask)
        # Spatial: frames fold into D; no RPE, no mask.
        spatial_in = temporal_out.transpose(0, 2, 1, 3)  # (B, T, HW, C)
        spatial_out = RPEAttention(
            channels=c,
            num_heads=self.num_heads,
            use_rpe_q=False,
            use_rpe_k=False,
            use_rpe_v=False,
            dtype=self.dtype,
            name="spatial_attention",
        )(spatial_in)
        return spatial_out.reshape(bt, hh, ww, c)
