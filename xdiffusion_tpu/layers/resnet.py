"""Residual blocks and resampling layers for UNet-family score networks.

Counterparts of the reference blocks (/root/reference/xdiffusion/layers/
resnet.py:9-200): DDPM WideResNet-style blocks and BigGAN up/down blocks,
with adaptive GroupNorm (scale-shift) timestep conditioning. NHWC layout;
the closing conv of each residual branch is zero-initialized so blocks
start as identity (standard diffusion-UNet trick, keeps early training
stable and XLA-fuses into a no-op at init).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Route the GroupNorm->SiLU block openers through the fused Pallas kernel
# (ops/group_norm.py). Off by default until it wins on the bench.
_FUSED_NORM = os.environ.get("XDIFFUSION_FUSED_NORM", "0") == "1"

# Fuse the whole norm->SiLU->conv3x3 interior (and the closing skip-add)
# of eligible residual blocks into one Pallas kernel per conv
# (ops/fused_resblock.py) — the batch-scaling byte-reduction lever.
# Off by default until it wins on the bench.
_FUSED_RESBLOCK = os.environ.get("XDIFFUSION_FUSED_RESBLOCK", "0") == "1"


class FastGroupNorm(nn.Module):
    """Drop-in GroupNorm (param-compatible with nn.GroupNorm) routed
    through ops.norm: statistics in fp32 with converts fused into the
    reductions, normalize+affine(+scale-shift)(+SiLU) as one elementwise
    pass in the activation dtype. Eliminates the standalone bf16<->fp32
    retile converts flax's GroupNorm leaves on TPU (46% of UNet forward
    device time at batch 512)."""

    num_groups: int
    # torch nn.GroupNorm default (the reference's convention) — imported
    # reference checkpoints must normalize exactly as the weights were
    # trained (flax's own GroupNorm defaults to 1e-6).
    epsilon: float = 1e-5
    # Video semantics: when > 1 the input's leading axis is a folded
    # (batch * frames) and the GroupNorm statistics must span ALL frames
    # of an example — the reference's 3D blocks normalize the 5D
    # (B, C, F, H, W) map (reference layers/resnet_3d.py:148,196), so
    # frames share stats even though our convs run frame-folded.
    stat_frames: int = 1
    dtype: jnp.dtype = jnp.float32
    silu: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t_scale: Optional[jax.Array] = None,
        t_shift: Optional[jax.Array] = None,
        channel_shift: Optional[jax.Array] = None,
        return_coefficients: bool = False,
    ) -> jax.Array:
        from xdiffusion_tpu.ops.norm import (
            _apply_affine,
            group_norm,
            group_norm_coefficients,
            group_norm_scale_shift,
        )

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if return_coefficients:
            # Fused-conv path (ops/fused_resblock.py): hand back the
            # per-(B, C) fp32 affine so the normalize+SiLU application can
            # ride the conv's input load instead of its own HBM pass.
            # channel_shift folds additive timestep conditioning
            # (norm(h + emb)) into the coefficients in closed form.
            # stat_frames > 1 (video): statistics span the unfolded
            # (B, F, ...) view, coefficients repeat to the folded (BF, C)
            # batch; a spatially-constant-but-per-frame channel_shift
            # would need per-frame stat bookkeeping, so that combination
            # stays on the unfused path (callers gate on it).
            if self.stat_frames > 1:
                assert channel_shift is None
                f = self.stat_frames
                bf = x.shape[0]
                xu = x.reshape(bf // f, f, *x.shape[1:])
                a, off = group_norm_coefficients(
                    xu, scale, bias, self.num_groups, self.epsilon
                )
                a = jnp.repeat(a, f, axis=0)    # (BF, C)
                off = jnp.repeat(off, f, axis=0)
            else:
                a, off = group_norm_coefficients(
                    x, scale, bias, self.num_groups, self.epsilon,
                    channel_shift=channel_shift,
                )
            if t_scale is not None:
                ts = t_scale.reshape(x.shape[0], -1).astype(jnp.float32)
                tsh = t_shift.reshape(x.shape[0], -1).astype(jnp.float32)
                a, off = a * (1.0 + ts), off * (1.0 + ts) + tsh
            return a, off

        if self.stat_frames > 1:
            # Statistics over the UNFOLDED (B, F, ..., C) view so all of
            # an example's frames share mean/var; the affine (+ optional
            # per-frame scale-shift conditioning) applies on the folded
            # tensor, so no data movement on the big array.
            f = self.stat_frames
            bf = x.shape[0]
            xu = x.reshape(bf // f, f, *x.shape[1:])
            a, off = group_norm_coefficients(
                xu, scale, bias, self.num_groups, self.epsilon
            )  # (B, C)
            a = jnp.repeat(a, f, axis=0)  # (BF, C)
            off = jnp.repeat(off, f, axis=0)
            if t_scale is not None:
                ts = t_scale.reshape(bf, -1).astype(jnp.float32)
                tsh = t_shift.reshape(bf, -1).astype(jnp.float32)
                a, off = a * (1.0 + ts), off * (1.0 + ts) + tsh
            return _apply_affine(x, a, off, self.silu)

        if t_scale is not None:
            return group_norm_scale_shift(
                x, scale, bias, self.num_groups, t_scale, t_shift,
                eps=self.epsilon, silu=self.silu,
            )
        return group_norm(
            x, scale, bias, self.num_groups, eps=self.epsilon, silu=self.silu
        )


def _group_norm(
    c: int, name: str, dtype, silu: bool = False, stat_frames: int = 1
) -> FastGroupNorm:
    # GroupNorm(32) like the reference, but degrade gracefully for thin
    # channels (tests / tiny configs).
    groups = 32 if c % 32 == 0 else max(1, c // 4)
    return FastGroupNorm(
        num_groups=groups, name=name, dtype=dtype, silu=silu,
        stat_frames=stat_frames,
    )


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm + SiLU through the fused Pallas kernel (XLA fallback)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from xdiffusion_tpu.ops import group_norm_silu

        c = self.channels
        groups = 32 if c % 32 == 0 else max(1, c // 4)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm_silu(
            x, scale, bias, num_groups=groups, apply_silu=True
        ).astype(self.dtype)


def _norm_silu(x, c: int, name: str, dtype, stat_frames: int = 1):
    """silu(groupnorm(x)) in one fused pass."""
    if _FUSED_NORM and stat_frames == 1:
        return FusedGroupNormSiLU(channels=c, dtype=dtype, name=name)(x)
    return _group_norm(c, name, dtype, silu=True, stat_frames=stat_frames)(x)


class _FusedAffineConv(nn.Module):
    """3x3 'SAME' conv whose input load applies a per-(B, C) affine + SiLU
    and whose epilogue adds an optional residual — parameter-compatible
    with the `nn.Conv` it replaces (same kernel/bias names, shapes, and
    initializers), so checkpoints are interchangeable with the unfused
    path."""

    features: int
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, a, off, residual=None):
        from xdiffusion_tpu.ops.fused_resblock import affine_silu_conv3x3

        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros
            if self.zero_init
            else nn.initializers.lecun_normal(),
            (3, 3, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return affine_silu_conv3x3(
            x.astype(self.dtype), a, off, kernel.astype(self.dtype), bias,
            residual=residual if residual is None
            else residual.astype(self.dtype),
        )


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, 2H, 2W, C) nearest-neighbor."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


class Downsample(nn.Module):
    """2x spatial downsample: strided conv if with_conv else avg-pool."""

    channels: int
    with_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: Dict = None, **kwargs) -> jax.Array:
        if self.with_conv:
            # torch Conv2d(stride=2, padding=1) symmetric padding (flax
            # 'SAME' at stride 2 pads (0,1) and shifts the grid).
            return nn.Conv(
                self.channels, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv",
            )(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    """2x spatial upsample: nearest-neighbor + optional 3x3 conv."""

    channels: int
    with_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: Dict = None, **kwargs) -> jax.Array:
        x = nearest_upsample_2x(x)
        if self.with_conv:
            x = nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="conv")(x)
        return x


def _emb_mlp_stack(emb, emb_dim: int, layers: int, dtype):
    """Stack of `layers` Mlps (fc1 -> SiLU -> fc2) over the raw embedding
    — the video-UNet conditioning path (reference layers/resnet_3d.py:
    172-193 with layers/mlp.py Mlp, hidden = in_features)."""
    e = emb
    for i in range(layers):
        hidden = e.shape[-1]
        e = nn.Dense(hidden, dtype=dtype, name=f"emb_mlp{i}_fc1")(e)
        e = nn.Dense(emb_dim, dtype=dtype, name=f"emb_mlp{i}_fc2")(nn.silu(e))
    return e


class ResnetBlockBigGAN(nn.Module):
    """BigGAN-style residual block with optional built-in up/downsampling.

    Timestep conditioning is adaptive GroupNorm when use_scale_shift_norm,
    else additive (reference behavior: layers/resnet.py:83-200).
    """

    dim_out: int
    use_scale_shift_norm: bool = True
    use_conv: bool = False  # 3x3 (vs 1x1) skip projection on channel change
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    # Video-UNet conditioning contract ("Video Diffusion Models" found
    # multiple MLP layers helped; reference layers/resnet_3d.py:172-193):
    # when > 0 the emb projection is a stack of this many
    # fc1->SiLU->fc2 Mlps applied to the RAW embedding (no leading SiLU),
    # each fc1 keeping its input width. 0 keeps the image-UNet
    # SiLU->Linear contract.
    emb_mlp_layers: int = 0
    # Video semantics: frames folded into the batch axis share GroupNorm
    # statistics (see FastGroupNorm.stat_frames). 1 = image behavior.
    stat_frames: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> jax.Array:
        dim_in = x.shape[-1]
        # Fused interior: normalize+SiLU rides each conv's input load, and
        # the skip-add rides conv2's epilogue (ops/fused_resblock.py) —
        # one fewer HBM round-trip per norm site. Works for the video
        # blocks too (frames folded into batch, shared-stat GroupNorm
        # coefficients repeat per frame). Ineligible: resampling blocks
        # (the resample sits between norm1 and conv1), non-4D maps, the
        # training dropout path (the mask sits between norm2 and conv2),
        # and additive conditioning with shared-frame stats (see
        # FastGroupNorm.return_coefficients).
        fused = (
            _FUSED_RESBLOCK
            and not (self.up or self.down)
            and x.ndim == 4
        )
        if fused:
            a1, o1 = _group_norm(
                dim_in, "norm1", self.dtype, stat_frames=self.stat_frames
            )(x, return_coefficients=True)
            h = _FusedAffineConv(
                self.dim_out, dtype=self.dtype, name="conv1"
            )(x, a1, o1)
        else:
            h = _norm_silu(
                x, dim_in, "norm1", self.dtype, stat_frames=self.stat_frames
            )
            if self.up:
                h = nearest_upsample_2x(h)
                x = nearest_upsample_2x(x)
            elif self.down:
                h = avg_pool_2x(h)
                x = avg_pool_2x(x)
            h = nn.Conv(self.dim_out, (3, 3), dtype=self.dtype, name="conv1")(h)

        emb = context["timestep_embedding"]
        if "class_embedding" in context:
            emb = emb + context["class_embedding"]
        emb_dim = 2 * self.dim_out if self.use_scale_shift_norm else self.dim_out
        if self.emb_mlp_layers > 0:
            emb_out = _emb_mlp_stack(
                emb, emb_dim, self.emb_mlp_layers, self.dtype
            )
        else:
            emb_out = nn.Dense(emb_dim, dtype=self.dtype, name="emb_proj")(
                nn.silu(emb)
            )
        emb_out = emb_out[:, None, None, :]

        norm2 = _group_norm(
            self.dim_out, "norm2", self.dtype, silu=True,
            stat_frames=self.stat_frames,
        )
        dropping = self.dropout > 0.0 and not deterministic
        if (
            fused
            and not dropping
            and (self.use_scale_shift_norm or self.stat_frames == 1)
        ):
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                a2, o2 = norm2(
                    h, t_scale=scale, t_shift=shift, return_coefficients=True
                )
            else:
                a2, o2 = norm2(
                    h, channel_shift=emb_out, return_coefficients=True
                )
            if dim_in != self.dim_out:
                if self.use_conv:
                    x = nn.Conv(
                        self.dim_out, (3, 3), dtype=self.dtype, name="skip"
                    )(x)
                else:
                    x = nn.Conv(
                        self.dim_out, (1, 1), dtype=self.dtype, name="skip"
                    )(x)
            return _FusedAffineConv(
                self.dim_out, zero_init=True, dtype=self.dtype, name="conv2"
            )(h, a2, o2, residual=x)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = norm2(h, t_scale=scale, t_shift=shift)
        else:
            h = norm2(h + emb_out)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            self.dim_out,
            (3, 3),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv2",
        )(h)

        if dim_in != self.dim_out:
            if self.use_conv:
                x = nn.Conv(self.dim_out, (3, 3), dtype=self.dtype, name="skip")(x)
            else:
                x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class ResnetBlockDDPM(nn.Module):
    """Original DDPM WideResNet block (reference: layers/resnet.py:9-81)."""

    dim_out: int
    use_scale_shift_norm: bool = False
    dropout: float = 0.0
    # See ResnetBlockBigGAN.emb_mlp_layers / stat_frames.
    emb_mlp_layers: int = 0
    stat_frames: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> jax.Array:
        dim_in = x.shape[-1]
        fused = _FUSED_RESBLOCK and x.ndim == 4
        if fused:
            a1, o1 = _group_norm(
                dim_in, "norm1", self.dtype, stat_frames=self.stat_frames
            )(x, return_coefficients=True)
            h = _FusedAffineConv(
                self.dim_out, dtype=self.dtype, name="conv1"
            )(x, a1, o1)
        else:
            h = _group_norm(
                dim_in, "norm1", self.dtype, silu=True,
                stat_frames=self.stat_frames,
            )(x)
            h = nn.Conv(self.dim_out, (3, 3), dtype=self.dtype, name="conv1")(h)

        emb = context["timestep_embedding"]
        if "class_embedding" in context:
            emb = emb + context["class_embedding"]
        emb_dim = 2 * self.dim_out if self.use_scale_shift_norm else self.dim_out
        if self.emb_mlp_layers > 0:
            emb_out = _emb_mlp_stack(
                emb, emb_dim, self.emb_mlp_layers, self.dtype
            )
        else:
            emb_out = nn.Dense(emb_dim, dtype=self.dtype, name="emb_proj")(
                nn.silu(emb)
            )
        emb_out = emb_out[:, None, None, :]

        norm2 = _group_norm(
            self.dim_out, "norm2", self.dtype, silu=True,
            stat_frames=self.stat_frames,
        )
        dropping = self.dropout > 0.0 and not deterministic
        if (
            fused
            and not dropping
            and (self.use_scale_shift_norm or self.stat_frames == 1)
        ):
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                a2, o2 = norm2(
                    h, t_scale=scale, t_shift=shift, return_coefficients=True
                )
            else:
                a2, o2 = norm2(
                    h, channel_shift=emb_out, return_coefficients=True
                )
            if dim_in != self.dim_out:
                x = nn.Dense(self.dim_out, dtype=self.dtype, name="skip")(x)
            return _FusedAffineConv(
                self.dim_out, dtype=self.dtype, name="conv2"
            )(h, a2, o2, residual=x)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = norm2(h, t_scale=scale, t_shift=shift)
        else:
            h = norm2(h + emb_out)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.dim_out, (3, 3), dtype=self.dtype, name="conv2")(h)

        if dim_in != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name="skip")(x)
        return x + h
