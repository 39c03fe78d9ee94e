"""LTX-Video causal VAE — faithful architecture.

Counterpart of /root/reference/xdiffusion/autoencoders/ltx_vae.py:81-1425:
block-grammar encoder/decoder (res_x / res_x_y / compress_* vocabulary)
with causal 3D convolutions, DualConv3d (factorized spatial+temporal)
kernels for dims=(2,1), pixel/layer/group norms, spatial patchify,
DepthToSpaceUpsample decoding (first-frame drop on temporal stride,
optional residual), StyleGAN-style spatial noise injection, and
denoising-decoder timestep conditioning (scale-shift tables driven by a
PixArt-style timestep embedder; reference ltx_vae.py:600-660,1126-1206).

Framework conventions (shared with AutoencoderKL / kl.py): NDHWC
(B, F, H, W, C) layout, no internal [0,1]->[-1,1] normalization (the
diffusion process owns value ranges), params dict {"ae", "disc"}, and
the VariationalAutoEncoder protocol (encode_to_latents /
decode_from_latents / training_losses).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xdiffusion_tpu.autoencoders.base import VariationalAutoEncoder
from xdiffusion_tpu.autoencoders.causal_video import _moments_to_distribution
from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.layers.embedding import glide_timestep_embedding

Dims = Union[int, Tuple[int, int]]


# -- convolution primitives ---------------------------------------------------


class CausalConv3d(nn.Module):
    """3D conv, causal on the frame axis: the first output frame sees only
    the first input frame (reference ltx_vae.py:746-801). Non-causal mode
    replicates both edges symmetrically. Spatial padding is zeros (torch
    Conv3d semantics); temporal padding replicates."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    causal: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, causal: Optional[bool] = None) -> jax.Array:
        kt, kh, kw = self.kernel
        is_causal = self.causal if causal is None else causal
        if kt > 1:
            if is_causal:
                pad = (kt - 1, 0)
            else:
                pad = ((kt - 1) // 2, (kt - 1) // 2)
            x = jnp.pad(
                x, ((0, 0), pad, (0, 0), (0, 0), (0, 0)), mode="edge"
            )
        return nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            use_bias=self.use_bias,
            name="conv",
        )(x)


class DualConv3d(nn.Module):
    """Factorized 3D conv: spatial (1,kh,kw) then temporal (kt,1,1), with
    an intermediate width of max(in, out) (reference ltx_vae.py:804-958).
    Zero padding on all axes (non-causal), matching the torch module."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x: jax.Array, causal: Optional[bool] = None) -> jax.Array:
        kt, kh, kw = self.kernel
        st, sh, sw = self.strides
        pt, ph, pw = self.padding
        inter = max(x.shape[-1], self.features)
        x = nn.Conv(
            inter,
            (1, kh, kw),
            strides=(1, sh, sw),
            padding=((0, 0), (ph, ph), (pw, pw)),
            name="conv_spatial",
        )(x)
        return nn.Conv(
            self.features,
            (kt, 1, 1),
            strides=(st, 1, 1),
            padding=((pt, pt), (0, 0), (0, 0)),
            name="conv_temporal",
        )(x)


def make_conv_nd(
    dims: Dims,
    features: int,
    kernel_size: int = 3,
    strides: Tuple[int, int, int] = (1, 1, 1),
    causal: bool = False,
    padding: int = 0,
    name: Optional[str] = None,
):
    """Reference make_conv_nd (ltx_vae.py:670-724) for the 3D cases.

    `padding` mirrors the reference's default-0 argument: CausalConv3d
    ignores it (it pads itself — spatial k//2, temporal causal), but
    DualConv3d honors it, so for dims=(2,1) the reference's compress and
    DepthToSpaceUpsample convs (which don't pass padding) run UNPADDED
    and shrink the map — byte-parity requires mirroring that."""
    k = (kernel_size,) * 3
    if dims == 3 or dims == (3,):
        return CausalConv3d(
            features, k, strides, causal=causal, name=name
        )
    if tuple(dims) == (2, 1) if isinstance(dims, (list, tuple)) else False:
        return DualConv3d(
            features, k, strides, padding=(padding,) * 3, name=name
        )
    raise ValueError(f"unsupported dims for video VAE: {dims}")


# -- norms --------------------------------------------------------------------


def pixel_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + eps)


class _Norm(nn.Module):
    kind: str  # group_norm | pixel_norm | layer_norm
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.kind == "pixel_norm":
            return pixel_norm(x, 1e-8)
        if self.kind == "layer_norm":
            return nn.LayerNorm(epsilon=self.eps, name="ln")(x)
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        c = x.shape[-1]
        groups = 32 if c % 32 == 0 else max(1, c // 4)
        return FastGroupNorm(
            num_groups=groups, epsilon=self.eps, name="gn"
        )(x)


# -- timestep embedding (denoising decoder) ------------------------------------


class _TimestepEmbedder(nn.Module):
    """PixArt-style combined timestep embedder: sinusoidal(256) -> MLP
    (reference PixArtAlphaCombinedTimestepSizeEmbeddings usage,
    ltx_vae.py:1253-1257,604-610). The sinusoid is the GLIDE/DiT variant
    (cos-first, `half` divisor) that diffusers' Timesteps(256,
    flip_sin_to_cos=True, downscale_freq_shift=0) computes — NOT the
    transformer sinusoid."""

    dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        h = glide_timestep_embedding(t.reshape(-1), 256)
        h = nn.Dense(self.dim, name="fc1")(h)
        return nn.Dense(self.dim, name="fc2")(nn.silu(h))


# -- blocks ---------------------------------------------------------------------


class ResnetBlock3D(nn.Module):
    """Reference ResnetBlock3D (ltx_vae.py:1026-1206): norm/silu/causal-conv
    x2, optional spatial noise injection, optional per-block timestep
    scale-shift table, LayerNorm+1x1 shortcut on channel change."""

    dims: Dims
    features: int
    norm_layer: str = "group_norm"
    dropout: float = 0.0
    inject_noise: bool = False
    timestep_conditioning: bool = False
    eps: float = 1e-6

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        causal: bool = True,
        timestep_embed: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        in_ch = x.shape[-1]
        h = _Norm(self.norm_layer, self.eps, name="norm1")(x)

        if self.timestep_conditioning:
            table = self.param(
                "scale_shift_table",
                lambda key: jax.random.normal(key, (4, in_ch))
                / in_ch**0.5,
            )
            # timestep_embed: (B, 4*C) from the mid-block embedder.
            ada = table[None] + timestep_embed.reshape(-1, 4, in_ch)
            shift1, scale1, shift2, scale2 = (
                ada[:, i][:, None, None, None, :] for i in range(4)
            )
            h = h * (1 + scale1) + shift1

        h = nn.silu(h)
        h = make_conv_nd(
            self.dims, self.features, 3, causal=True, padding=1, name="conv1"
        )(h, causal=causal)

        if self.inject_noise:
            scale_1 = self.param(
                "per_channel_scale1",
                nn.initializers.zeros,
                (self.features,),
            )
            if noise_rng is not None:
                noise = jax.random.normal(
                    jax.random.fold_in(noise_rng, 1), h.shape[-3:-1]
                )
                h = h + noise[None, None, :, :, None] * scale_1

        h = _Norm(self.norm_layer, self.eps, name="norm2")(h)
        if self.timestep_conditioning:
            h = h * (1 + scale2) + shift2
        h = nn.silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = make_conv_nd(
            self.dims, self.features, 3, causal=True, padding=1, name="conv2"
        )(h, causal=causal)

        if self.inject_noise:
            scale_2 = self.param(
                "per_channel_scale2",
                nn.initializers.zeros,
                (self.features,),
            )
            if noise_rng is not None:
                noise = jax.random.normal(
                    jax.random.fold_in(noise_rng, 2), h.shape[-3:-1]
                )
                h = h + noise[None, None, :, :, None] * scale_2

        if in_ch != self.features:
            # Reference norm3 is an affine LayerNorm on the shortcut path.
            x = nn.LayerNorm(epsilon=self.eps, name="norm3")(x)
            x = nn.Conv(self.features, (1, 1, 1), name="conv_shortcut")(x)
        return x + h


class _MidBlockAttention(nn.Module):
    """Self-attention over all (F*H*W) tokens with RMS qk-norm and a
    residual connection (reference UNetMidBlock3D attn path,
    ltx_vae.py:1276-1296)."""

    head_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from xdiffusion_tpu.layers.norm import RMSNorm
        from xdiffusion_tpu.ops import dot_product_attention

        b, f, h, w, c = x.shape
        heads = c // self.head_dim
        tokens = x.reshape(b, f * h * w, c)
        q = nn.Dense(c, name="to_q")(tokens)
        k = nn.Dense(c, name="to_k")(tokens)
        v = nn.Dense(c, name="to_v")(tokens)
        split = lambda t: t.reshape(b, -1, heads, self.head_dim).transpose(
            0, 2, 1, 3
        )
        # eps=1e-5: the reference's diffusers Attention default
        # (layers/attention_diffusers.py:77), not RMSNorm's usual 1e-6.
        q = RMSNorm(dim=self.head_dim, eps=1e-5, name="q_norm")(split(q))
        kk = RMSNorm(dim=self.head_dim, eps=1e-5, name="k_norm")(split(k))
        out = dot_product_attention(q, kk, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, f * h * w, c)
        out = nn.Dense(c, name="to_out")(out)
        return (tokens + out).reshape(b, f, h, w, c)


class UNetMidBlock3D(nn.Module):
    """num_layers ResnetBlock3Ds (+ optional attention) sharing one
    timestep embedding (reference ltx_vae.py:1208-1376)."""

    dims: Dims
    features: int
    num_layers: int = 1
    norm_layer: str = "group_norm"
    inject_noise: bool = False
    timestep_conditioning: bool = False
    attention_head_dim: int = -1

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        causal: bool = True,
        timestep: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        timestep_embed = None
        if self.timestep_conditioning:
            assert timestep is not None
            timestep_embed = _TimestepEmbedder(
                dim=self.features * 4, name="time_embedder"
            )(timestep)
        for i in range(self.num_layers):
            x = ResnetBlock3D(
                dims=self.dims,
                features=self.features,
                norm_layer=self.norm_layer,
                inject_noise=self.inject_noise,
                timestep_conditioning=self.timestep_conditioning,
                name=f"res_{i}",
            )(
                x,
                causal=causal,
                timestep_embed=timestep_embed,
                noise_rng=(
                    jax.random.fold_in(noise_rng, i)
                    if noise_rng is not None
                    else None
                ),
                deterministic=deterministic,
            )
            if self.attention_head_dim > 0:
                x = _MidBlockAttention(
                    head_dim=self.attention_head_dim, name=f"attn_{i}"
                )(x)
        return x


class DepthToSpaceUpsample(nn.Module):
    """conv -> pixel-unshuffle over (t, h, w); drops the duplicated first
    frame on temporal stride (causal convention); optional residual path
    (reference ltx_vae.py:1379-1425)."""

    dims: Dims
    stride: Tuple[int, int, int] = (2, 2, 2)
    residual: bool = False
    out_channels_reduction_factor: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = True) -> jax.Array:
        p1, p2, p3 = self.stride
        in_ch = x.shape[-1]
        out_ch = int(np.prod(self.stride)) * in_ch // self.out_channels_reduction_factor

        def unshuffle(t):
            b, f, h, w, c = t.shape
            cc = c // (p1 * p2 * p3)
            # torch channel layout "(c p1 p2 p3)" is c-major.
            t = t.reshape(b, f, h, w, cc, p1, p2, p3)
            t = t.transpose(0, 1, 5, 2, 6, 3, 7, 4)
            return t.reshape(b, f * p1, h * p2, w * p3, cc)

        if self.residual:
            x_in = unshuffle(
                jnp.tile(
                    x,
                    (1, 1, 1, 1, int(np.prod(self.stride))
                     // self.out_channels_reduction_factor),
                )
            )
            if p1 == 2:
                x_in = x_in[:, 1:]
        h = make_conv_nd(self.dims, out_ch, 3, causal=True, name="conv")(
            x, causal=causal
        )
        h = unshuffle(h)
        if p1 == 2:
            h = h[:, 1:]
        if self.residual:
            h = h + x_in
        return h


# -- patchify -------------------------------------------------------------------


def patchify(x: jax.Array, patch_size_hw: int) -> jax.Array:
    """(B, F, H, W, C) -> (B, F, H/q, W/q, C*q*q) with torch's "(c r q)"
    channel ordering (reference ltx_vae.py:961-980)."""
    q = patch_size_hw
    if q == 1:
        return x
    b, f, h, w, c = x.shape
    x = x.reshape(b, f, h // q, q, w // q, q, c)
    # target channel layout (c, r, q): c-major, then w-patch r, then h-patch q
    x = x.transpose(0, 1, 2, 4, 6, 5, 3)  # b f h' w' c r q
    return x.reshape(b, f, h // q, w // q, c * q * q)


def unpatchify(x: jax.Array, patch_size_hw: int) -> jax.Array:
    q = patch_size_hw
    if q == 1:
        return x
    b, f, h, w, cqq = x.shape
    c = cqq // (q * q)
    x = x.reshape(b, f, h, w, c, q, q)  # c r q
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)  # b f h q w r c
    return x.reshape(b, f, h * q, w * q, c)


# -- encoder / decoder ----------------------------------------------------------


def _as_block_params(p) -> Dict:
    from collections.abc import Mapping

    if isinstance(p, Mapping):
        return dict(p)
    if hasattr(p, "to_dict"):
        return p.to_dict()
    return {"num_layers": int(p)}


class LTXEncoder(nn.Module):
    """Reference Encoder (ltx_vae.py:268-450)."""

    dims: Dims
    in_channels: int
    latent_channels: int
    blocks: Tuple
    base_channels: int = 128
    patch_size: int = 1
    norm_layer: str = "group_norm"
    latent_log_var: str = "per_channel"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = patchify(x, self.patch_size)
        out_ch = self.base_channels
        x = make_conv_nd(self.dims, out_ch, 3, causal=True, padding=1, name="conv_in")(x)

        for i, (block_name, raw) in enumerate(self.blocks):
            bp = _as_block_params(raw)
            name = f"down_{i}_{block_name}"
            if block_name == "res_x":
                x = UNetMidBlock3D(
                    dims=self.dims,
                    features=out_ch,
                    num_layers=int(bp["num_layers"]),
                    norm_layer=self.norm_layer,
                    name=name,
                )(x)
            elif block_name == "res_x_y":
                out_ch = int(bp.get("multiplier", 2)) * out_ch
                x = ResnetBlock3D(
                    dims=self.dims,
                    features=out_ch,
                    norm_layer=self.norm_layer,
                    name=name,
                )(x)
            elif block_name == "compress_time":
                x = make_conv_nd(
                    self.dims, out_ch, 3, strides=(2, 1, 1), causal=True,
                    name=name,
                )(x)
            elif block_name == "compress_space":
                x = make_conv_nd(
                    self.dims, out_ch, 3, strides=(1, 2, 2), causal=True,
                    name=name,
                )(x)
            elif block_name == "compress_all":
                x = make_conv_nd(
                    self.dims, out_ch, 3, strides=(2, 2, 2), causal=True,
                    name=name,
                )(x)
            elif block_name == "compress_all_x_y":
                out_ch = int(bp.get("multiplier", 2)) * out_ch
                x = make_conv_nd(
                    self.dims, out_ch, 3, strides=(2, 2, 2), causal=True,
                    name=name,
                )(x)
            else:
                raise ValueError(f"unknown encoder block: {block_name}")

        x = _Norm(self.norm_layer, name="conv_norm_out")(x)
        x = nn.silu(x)
        if self.latent_log_var == "per_channel":
            conv_out = 2 * self.latent_channels
        elif self.latent_log_var == "uniform":
            conv_out = self.latent_channels + 1
        elif self.latent_log_var == "none":
            conv_out = self.latent_channels
        else:
            raise ValueError(f"invalid latent_log_var {self.latent_log_var}")
        x = make_conv_nd(self.dims, conv_out, 3, causal=True, padding=1, name="conv_out")(x)
        return x


class LTXDecoder(nn.Module):
    """Reference Decoder (ltx_vae.py:453-667)."""

    dims: Dims
    out_channels: int
    blocks: Tuple
    base_channels: int = 128
    patch_size: int = 1
    norm_layer: str = "group_norm"
    causal: bool = True
    timestep_conditioning: bool = False

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        timestep: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        # Channel plan: start at base * prod(multipliers) and divide back
        # down (reference ltx_vae.py:500-506).
        out_ch = self.base_channels
        for block_name, raw in self.blocks:
            bp = _as_block_params(raw)
            if block_name == "res_x_y":
                out_ch = out_ch * int(bp.get("multiplier", 2))
            if block_name == "compress_all":
                out_ch = out_ch * int(bp.get("multiplier", 1))

        # Reference decoder runs conv_in with its OWN causal flag
        # (ltx_vae.py:619: self.conv_in(sample, causal=self.causal)).
        x = make_conv_nd(self.dims, out_ch, 3, causal=True, padding=1, name="conv_in")(
            z, causal=self.causal
        )

        scaled_timestep = None
        if self.timestep_conditioning:
            assert timestep is not None
            mult = self.param(
                "timestep_scale_multiplier",
                lambda key: jnp.asarray(1000.0, dtype=jnp.float32),
            )
            scaled_timestep = timestep * mult

        for i, (block_name, raw) in enumerate(self.blocks):
            bp = _as_block_params(raw)
            name = f"up_{i}_{block_name}"
            rng_i = (
                jax.random.fold_in(noise_rng, i)
                if noise_rng is not None
                else None
            )
            if block_name == "res_x":
                x = UNetMidBlock3D(
                    dims=self.dims,
                    features=out_ch,
                    num_layers=int(bp["num_layers"]),
                    norm_layer=self.norm_layer,
                    inject_noise=bool(bp.get("inject_noise", False)),
                    timestep_conditioning=self.timestep_conditioning,
                    name=name,
                )(
                    x,
                    causal=self.causal,
                    timestep=scaled_timestep,
                    noise_rng=rng_i,
                    deterministic=deterministic,
                )
            elif block_name == "attn_res_x":
                x = UNetMidBlock3D(
                    dims=self.dims,
                    features=out_ch,
                    num_layers=int(bp["num_layers"]),
                    norm_layer=self.norm_layer,
                    inject_noise=bool(bp.get("inject_noise", False)),
                    timestep_conditioning=self.timestep_conditioning,
                    attention_head_dim=int(bp["attention_head_dim"]),
                    name=name,
                )(
                    x,
                    causal=self.causal,
                    timestep=scaled_timestep,
                    noise_rng=rng_i,
                    deterministic=deterministic,
                )
            elif block_name == "res_x_y":
                out_ch = out_ch // int(bp.get("multiplier", 2))
                x = ResnetBlock3D(
                    dims=self.dims,
                    features=out_ch,
                    norm_layer=self.norm_layer,
                    inject_noise=bool(bp.get("inject_noise", False)),
                    name=name,
                )(x, causal=self.causal, noise_rng=rng_i,
                  deterministic=deterministic)
            elif block_name == "compress_time":
                x = DepthToSpaceUpsample(
                    dims=self.dims, stride=(2, 1, 1), name=name
                )(x, causal=self.causal)
            elif block_name == "compress_space":
                x = DepthToSpaceUpsample(
                    dims=self.dims, stride=(1, 2, 2), name=name
                )(x, causal=self.causal)
            elif block_name == "compress_all":
                out_ch = out_ch // int(bp.get("multiplier", 1))
                x = DepthToSpaceUpsample(
                    dims=self.dims,
                    stride=(2, 2, 2),
                    residual=bool(bp.get("residual", False)),
                    out_channels_reduction_factor=int(bp.get("multiplier", 1)),
                    name=name,
                )(x, causal=self.causal)
            else:
                raise ValueError(f"unknown decoder block: {block_name}")

        x = _Norm(self.norm_layer, name="conv_norm_out")(x)

        if self.timestep_conditioning:
            emb = _TimestepEmbedder(dim=out_ch * 2, name="last_time_embedder")(
                scaled_timestep
            )
            table = self.param(
                "last_scale_shift_table",
                lambda key: jax.random.normal(key, (2, out_ch)) / out_ch**0.5,
            )
            ada = table[None] + emb.reshape(-1, 2, out_ch)
            shift = ada[:, 0][:, None, None, None, :]
            scale = ada[:, 1][:, None, None, None, :]
            x = x * (1 + scale) + shift

        x = nn.silu(x)
        x = make_conv_nd(
            self.dims,
            self.out_channels * self.patch_size**2,
            3,
            causal=True,
            padding=1,
            name="conv_out",
        )(x, causal=self.causal)
        return unpatchify(x, self.patch_size)


class _LTXVAEModule(nn.Module):
    """Flax module pairing LTXEncoder/LTXDecoder with optional 1x1 quant
    convs (reference ltx_vae.py:120-133)."""

    config: Any
    latent_channels: int

    def setup(self):
        cfg = self.config
        dims = cfg.dims
        if isinstance(dims, list):
            dims = tuple(dims)
        double_z = bool(cfg.get("double_z", True))
        latent_log_var = cfg.get(
            "latent_log_var", "per_channel" if double_z else "none"
        )
        self.latent_log_var = latent_log_var
        self.use_quant_conv = bool(cfg.get("use_quant_conv", True))
        if self.use_quant_conv and latent_log_var == "uniform":
            # Reference invariant (ltx_vae.py:98-99).
            raise ValueError(
                "uniform latent_log_var requires use_quant_conv=False"
            )
        self.encoder = LTXEncoder(
            dims=dims,
            in_channels=int(cfg.get("in_channels", 3)),
            latent_channels=int(cfg.latent_channels),
            blocks=tuple(tuple(b) for b in cfg.encoder_blocks),
            patch_size=int(cfg.get("patch_size", 1)),
            norm_layer=cfg.get("norm_layer", "group_norm"),
            latent_log_var=latent_log_var,
        )
        self.decoder = LTXDecoder(
            dims=dims,
            out_channels=int(cfg.get("out_channels", 3)),
            blocks=tuple(tuple(b) for b in cfg.decoder_blocks),
            patch_size=int(cfg.get("patch_size", 1)),
            norm_layer=cfg.get("norm_layer", "group_norm"),
            causal=bool(cfg.get("causal_decoder", False)),
            timestep_conditioning=bool(cfg.get("timestep_conditioning", False)),
        )
        if self.use_quant_conv:
            self.quant_conv = nn.Conv(
                2 * self.latent_channels, (1, 1, 1), name="quant_conv"
            )
            self.post_quant_conv = nn.Conv(
                self.latent_channels, (1, 1, 1), name="post_quant_conv"
            )

    def encode_moments(self, x: jax.Array) -> jax.Array:
        h = self.encoder(x)
        if self.latent_log_var == "uniform":
            # Broadcast the single logvar channel to per-channel width
            # (reference ltx_vae.py:437-450).
            mean, logvar = h[..., : self.latent_channels], h[..., -1:]
            h = jnp.concatenate(
                [mean, jnp.broadcast_to(logvar, mean.shape)], axis=-1
            )
        elif self.latent_log_var == "none":
            h = jnp.concatenate([h, jnp.zeros_like(h)], axis=-1)
        if self.use_quant_conv:
            h = self.quant_conv(h)
        return h

    def decode(
        self,
        z: jax.Array,
        timestep: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        if self.use_quant_conv:
            z = self.post_quant_conv(z)
        if self.decoder.timestep_conditioning and timestep is None:
            timestep = jnp.zeros((z.shape[0],), dtype=jnp.float32)
        return self.decoder(z, timestep=timestep, noise_rng=noise_rng)

    def __call__(
        self,
        x: jax.Array,
        rng: jax.Array,
        inject_noise: bool = False,
    ):
        moments = self.encode_moments(x)
        dist = _moments_to_distribution(moments, self.latent_channels)
        rng_s, rng_t, rng_e, rng_d = jax.random.split(rng, 4)
        z = dist.sample(rng_s)
        timestep = None
        if inject_noise and self.decoder.timestep_conditioning:
            # Denoising-decoder training: perturb latents with a small
            # noise level and condition the decoder on it
            # (reference ltx_vae.py:182-206).
            timestep = 0.2 * jax.random.uniform(rng_t, (z.shape[0],))
            eps = jax.random.normal(rng_e, z.shape, dtype=z.dtype)
            z = z + timestep[:, None, None, None, None] * eps
        return self.decode(z, timestep=timestep, noise_rng=rng_d), moments


class CausalVideoAutoencoder(VariationalAutoEncoder):
    """LTX-Video VAE (reference ltx_vae.py:81-265), framework surface."""

    def __init__(self, config: DotConfig, **kwargs):
        self._config = config
        double_z = bool(config.get("double_z", True))
        llv = config.get(
            "latent_log_var", "per_channel" if double_z else "none"
        )
        if bool(config.get("use_quant_conv", True)) and llv == "uniform":
            raise ValueError(
                "uniform latent_log_var requires use_quant_conv=False"
            )
        self.input_number_of_frames = int(
            config.get("input_number_of_frames", 25)
        )
        self.latent_channels = int(config.latent_channels)
        self.module = _LTXVAEModule(
            config=config, latent_channels=self.latent_channels
        )
        from xdiffusion_tpu.config import instantiate_from_config

        self.loss_module = (
            instantiate_from_config(config.loss_config.to_dict())
            if "loss_config" in config
            else None
        )
        size = int(config.get("sample_size", 64))
        self._example_shape = (
            self.input_number_of_frames,
            size,
            size,
            int(config.get("in_channels", 3)),
        )

    # -- frames contract (reference ltx_vae.py:141-153): tile or clip to
    # the configured frame count before encoding.
    def _fit_frames(self, x: jax.Array) -> jax.Array:
        f = x.shape[1]
        want = self.input_number_of_frames
        if f < want:
            reps = -(-want // f)
            x = jnp.tile(x, (1, reps, 1, 1, 1))
        return x[:, :want]

    def init_params(self, rng: jax.Array, batch_size: int = 1) -> Dict:
        x = jnp.zeros((batch_size,) + self._example_shape)
        rng_p, rng_s, rng_l = jax.random.split(rng, 3)
        params = {"ae": jax.jit(self.module.init)(rng_p, x, rng_s)}
        if self.loss_module is not None:
            recon, moments = jax.eval_shape(
                lambda p, xx, r: self.module.apply(p, xx, r),
                params["ae"], x, rng_s,
            )
            posterior = _moments_to_distribution(
                jnp.zeros(moments.shape), self.latent_channels
            )
            recon_shape = (batch_size, x.shape[1]) + recon.shape[2:]
            params["disc"] = self.loss_module.init(
                rng_l, x, jnp.zeros(recon_shape),
                posterior, 1, jnp.zeros((), jnp.int32),
            )
        return params

    def training_losses(
        self,
        params: Dict,
        rng: jax.Array,
        inputs: jax.Array,
        optimizer_idx: int,
        global_step: jax.Array,
        deterministic: bool = False,
    ) -> Tuple[jax.Array, Dict]:
        assert self.loss_module is not None, "config needs loss_config"
        inputs = self._fit_frames(inputs)

        def forward(ae_params):
            recon, moments = self.module.apply(
                ae_params, inputs, rng, inject_noise=True
            )
            recon = recon[:, : inputs.shape[1]]
            return recon, _moments_to_distribution(
                moments, self.latent_channels
            )

        recon, posterior = forward(params["ae"])
        from xdiffusion_tpu.autoencoders.losses import maybe_adaptive_weight

        adaptive = maybe_adaptive_weight(
            self.loss_module, params, forward, inputs, global_step,
            optimizer_idx, "decoder/conv_out",
        )
        loss, logs = self.loss_module.apply(
            params["disc"], inputs, recon, posterior, optimizer_idx,
            global_step, adaptive_weight=adaptive,
        )
        return loss, logs

    def encode_to_latents(self, params, x: jax.Array, rng: jax.Array):
        x = self._fit_frames(x)
        moments = self.module.apply(
            params["ae"] if "ae" in params else params,
            x,
            method=_LTXVAEModule.encode_moments,
        )
        dist = _moments_to_distribution(moments, self.latent_channels)
        return jax.lax.stop_gradient(dist.sample(rng))

    def decode_from_latents(self, params, z: jax.Array, timestep=None, **kwargs):
        return self.module.apply(
            params["ae"] if "ae" in params else params,
            z,
            timestep=timestep,
            method=_LTXVAEModule.decode,
        )
