"""HunyuanVideo causal-3D VAE — faithful architecture.

Counterpart of /root/reference/xdiffusion/autoencoders/hunyuan.py:34-1545:
diffusers-style causal 3D KL VAE with replicate-padded causal convs,
Down/UpEncoderBlockCausal3D stacks (spatial strides on the first
log2(spatial_ratio) levels, temporal strides on the last log2(time_ratio)
of those), a mid block with frame-causal full attention, first-frame-
aware nearest upsampling, 1x1 quant/post-quant convs, and spatial /
temporal tiled encode-decode with overlap blending (hunyuan.py:103-421).

Framework conventions: NDHWC (B, F, H, W, C), params {"ae", "disc"},
VariationalAutoEncoder protocol. No internal [0,1] normalization (shared
convention with kl.py / ltx_vae.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xdiffusion_tpu.autoencoders.base import VariationalAutoEncoder
from xdiffusion_tpu.autoencoders.causal_video import _moments_to_distribution
from xdiffusion_tpu.config import DotConfig


class CausalConv3d(nn.Module):
    """Causal 3D conv with replicate padding: (k-1) frames on the left of
    time, k//2 on each side of H/W (reference hunyuan.py:772-808)."""

    features: int
    kernel_size: int = 3
    strides: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        p = k // 2
        if k > 1:
            x = jnp.pad(
                x,
                ((0, 0), (k - 1, 0), (p, p), (p, p), (0, 0)),
                mode="edge",
            )
        return nn.Conv(
            self.features,
            (k, k, k),
            strides=self.strides,
            padding="VALID",
            name="conv",
        )(x)


def _group_norm(c: int, name: str):
    from xdiffusion_tpu.layers.resnet import FastGroupNorm

    groups = 32 if c % 32 == 0 else max(1, c // 4)
    return FastGroupNorm(num_groups=groups, epsilon=1e-6, name=name)


class ResnetBlockCausal3D(nn.Module):
    """GroupNorm/SiLU/causal-conv x2 with a 1x1 causal shortcut on channel
    change (reference hunyuan.py:996-1172, temb=None VAE path)."""

    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        in_ch = x.shape[-1]
        h = nn.silu(_group_norm(in_ch, "norm1")(x))
        h = CausalConv3d(self.features, 3, name="conv1")(h)
        h = nn.silu(_group_norm(self.features, "norm2")(h))
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = CausalConv3d(self.features, 3, name="conv2")(h)
        if in_ch != self.features:
            x = CausalConv3d(self.features, 1, name="conv_shortcut")(x)
        return x + h


class UpsampleCausal3D(nn.Module):
    """Nearest upsample, first frame spatial-only (causal convention),
    then causal conv (reference hunyuan.py:810-922)."""

    features: int
    upsample_factor: Tuple[int, int, int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ft, fh, fw = self.upsample_factor
        first, rest = x[:, :1], x[:, 1:]
        if rest.shape[1] > 0:
            if ft > 1:
                rest = jnp.repeat(rest, ft, axis=1)
            rest = jnp.repeat(jnp.repeat(rest, fh, axis=2), fw, axis=3)
        first = jnp.repeat(jnp.repeat(first, fh, axis=2), fw, axis=3)
        x = jnp.concatenate([first, rest], axis=1) if rest.shape[1] else first
        return CausalConv3d(self.features, 3, name="conv")(x)


class _CausalAttention(nn.Module):
    """Full attention over (F*H*W) tokens with a block-causal frame mask
    (reference UNetMidBlockCausal3D + prepare_causal_attention_mask,
    hunyuan.py:1385-1410,759-770)."""

    head_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, h, w, c = x.shape
        heads = max(1, c // self.head_dim)
        hd = c // heads
        tokens = _group_norm(c, "group_norm")(x).reshape(b, f * h * w, c)
        q = nn.Dense(c, name="to_q")(tokens)
        k = nn.Dense(c, name="to_k")(tokens)
        v = nn.Dense(c, name="to_v")(tokens)
        split = lambda t: t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        # Block-causal over frames: token in frame i attends to frames <= i.
        fi = jnp.repeat(jnp.arange(f), h * w)
        mask = jnp.where(fi[:, None] >= fi[None, :], 0.0, -jnp.inf)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        weights = jax.nn.softmax(logits + mask, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, f * h * w, c)
        out = nn.Dense(c, name="to_out")(out)
        return x + out.reshape(b, f, h, w, c)


class UNetMidBlockCausal3D(nn.Module):
    features: int
    add_attention: bool = True
    attention_head_dim: Optional[int] = None
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = ResnetBlockCausal3D(self.features, name="res_0")(
            x, deterministic=deterministic
        )
        head_dim = self.attention_head_dim or self.features
        for i in range(self.num_layers):
            if self.add_attention:
                x = _CausalAttention(head_dim=head_dim, name=f"attn_{i}")(x)
            x = ResnetBlockCausal3D(self.features, name=f"res_{i + 1}")(
                x, deterministic=deterministic
            )
        return x


def _down_up_plan(
    n_levels: int, spatial_ratio: int, time_ratio: int
) -> List[Tuple[bool, bool]]:
    """(add_spatial, add_time) per level (reference hunyuan.py:524-540:
    spatial strides on the first log2(s) levels, temporal on the last
    log2(t) non-final levels)."""
    n_s = int(math.log2(spatial_ratio))
    n_t = int(math.log2(time_ratio))
    plan = []
    for i in range(n_levels):
        is_final = i == n_levels - 1
        add_s = i < n_s
        add_t = i >= (n_levels - 1 - n_t) and not is_final
        plan.append((add_s, add_t))
    return plan


class EncoderCausal3D(nn.Module):
    """Reference EncoderCausal3D (hunyuan.py:488-628)."""

    latent_channels: int
    block_out_channels: Tuple[int, ...]
    layers_per_block: int = 2
    time_compression_ratio: int = 4
    spatial_compression_ratio: int = 8
    mid_block_add_attention: bool = True
    latent_logvar: str = "uniform"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        chans = self.block_out_channels
        x = CausalConv3d(chans[0], 3, name="conv_in")(x)
        plan = _down_up_plan(
            len(chans),
            self.spatial_compression_ratio,
            self.time_compression_ratio,
        )
        for i, (add_s, add_t) in enumerate(plan):
            out = chans[i]
            for j in range(self.layers_per_block):
                x = ResnetBlockCausal3D(out, name=f"down_{i}_res_{j}")(
                    x, deterministic=deterministic
                )
            if add_s or add_t:
                stride = (2 if add_t else 1, 2 if add_s else 1, 2 if add_s else 1)
                x = CausalConv3d(
                    out, 3, strides=stride, name=f"down_{i}_downsample"
                )(x)
        x = UNetMidBlockCausal3D(
            features=chans[-1],
            add_attention=self.mid_block_add_attention,
            attention_head_dim=chans[-1],
            name="mid_block",
        )(x, deterministic=deterministic)
        x = nn.silu(_group_norm(chans[-1], "conv_norm_out")(x))
        if self.latent_logvar == "per_channel":
            conv_out = 2 * self.latent_channels
        elif self.latent_logvar == "uniform":
            conv_out = self.latent_channels + 1
        elif self.latent_logvar == "none":
            conv_out = self.latent_channels
        else:
            raise ValueError(f"invalid latent_logvar {self.latent_logvar}")
        return CausalConv3d(conv_out, 3, name="conv_out")(x)


class DecoderCausal3D(nn.Module):
    """Reference DecoderCausal3D (hunyuan.py:630-757)."""

    out_channels: int
    block_out_channels: Tuple[int, ...]
    layers_per_block: int = 2
    time_compression_ratio: int = 4
    spatial_compression_ratio: int = 8
    mid_block_add_attention: bool = True

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        chans = self.block_out_channels
        rev = list(reversed(chans))
        x = CausalConv3d(rev[0], 3, name="conv_in")(z)
        x = UNetMidBlockCausal3D(
            features=rev[0],
            add_attention=self.mid_block_add_attention,
            attention_head_dim=rev[0],
            name="mid_block",
        )(x, deterministic=deterministic)
        plan = _down_up_plan(
            len(chans),
            self.spatial_compression_ratio,
            self.time_compression_ratio,
        )
        for i, (add_s, add_t) in enumerate(plan):
            out = rev[i]
            for j in range(self.layers_per_block + 1):
                x = ResnetBlockCausal3D(out, name=f"up_{i}_res_{j}")(
                    x, deterministic=deterministic
                )
            if add_s or add_t:
                factor = (2 if add_t else 1, 2 if add_s else 1, 2 if add_s else 1)
                x = UpsampleCausal3D(
                    out, upsample_factor=factor, name=f"up_{i}_upsample"
                )(x)
        x = nn.silu(_group_norm(chans[0], "conv_norm_out")(x))
        return CausalConv3d(self.out_channels, 3, name="conv_out")(x)


class _HunyuanVAEModule(nn.Module):
    config: Any
    latent_channels: int

    def setup(self):
        cfg = self.config
        self.latent_logvar = cfg.get("latent_logvar", "uniform")
        self.encoder = EncoderCausal3D(
            latent_channels=self.latent_channels,
            block_out_channels=tuple(cfg.block_out_channels),
            layers_per_block=int(cfg.get("layers_per_block", 2)),
            time_compression_ratio=int(cfg.get("time_compression_ratio", 4)),
            spatial_compression_ratio=int(
                cfg.get("spatial_compression_ratio", 8)
            ),
            mid_block_add_attention=bool(
                cfg.get("mid_block_add_attention", True)
            ),
            latent_logvar=self.latent_logvar,
        )
        self.decoder = DecoderCausal3D(
            out_channels=int(cfg.out_channels),
            block_out_channels=tuple(cfg.block_out_channels),
            layers_per_block=int(cfg.get("layers_per_block", 2)),
            time_compression_ratio=int(cfg.get("time_compression_ratio", 4)),
            spatial_compression_ratio=int(
                cfg.get("spatial_compression_ratio", 8)
            ),
            mid_block_add_attention=bool(
                cfg.get("mid_block_add_attention", True)
            ),
        )
        self.quant_conv = nn.Conv(
            2 * self.latent_channels, (1, 1, 1), name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.latent_channels, (1, 1, 1), name="post_quant_conv"
        )

    def encode_moments(self, x: jax.Array) -> jax.Array:
        h = self.encoder(x)
        if self.latent_logvar == "uniform":
            mean, logvar = h[..., : self.latent_channels], h[..., -1:]
            h = jnp.concatenate(
                [mean, jnp.broadcast_to(logvar, mean.shape)], axis=-1
            )
        elif self.latent_logvar == "none":
            h = jnp.concatenate([h, jnp.zeros_like(h)], axis=-1)
        return self.quant_conv(h)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, rng: jax.Array):
        moments = self.encode_moments(x)
        dist = _moments_to_distribution(moments, self.latent_channels)
        z = dist.sample(rng)
        return self.decode(z), moments


class HunyuanCausal3DVAE(VariationalAutoEncoder):
    """HunyuanVideo VAE (reference hunyuan.py:34-486), framework surface,
    with optional spatial/temporal tiled encode/decode."""

    def __init__(self, config: DotConfig, **kwargs):
        self._config = config
        self.latent_channels = int(config.latent_channels)
        self.module = _HunyuanVAEModule(
            config=config, latent_channels=self.latent_channels
        )
        from xdiffusion_tpu.config import instantiate_from_config

        self.loss_module = (
            instantiate_from_config(config.loss_config.to_dict())
            if "loss_config" in config
            else None
        )
        t_ratio = int(config.get("time_compression_ratio", 4))
        s_levels = len(list(config.block_out_channels)) - 1
        size = config.get("sample_size", 64)
        size = size[0] if isinstance(size, (list, tuple)) else int(size)
        self.tile_sample_min_tsize = int(config.get("sample_tsize", 29))
        self.tile_latent_min_tsize = self.tile_sample_min_tsize // t_ratio
        self.tile_sample_min_size = size
        self.tile_latent_min_size = int(size / (2**s_levels))
        self.tile_overlap_factor = 0.25
        self.use_spatial_tiling = False
        self.use_temporal_tiling = False
        frames = int(config.get("sample_tsize", 29))
        self._example_shape = (frames, size, size, int(config.in_channels))

    def enable_tiling(self, spatial: bool = True, temporal: bool = True):
        self.use_spatial_tiling = spatial
        self.use_temporal_tiling = temporal

    # -- framework protocol -------------------------------------------------

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

        def forward(ae_params):
            recon, moments = self.module.apply(ae_params, inputs, rng)
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

    def _encode_moments(self, params, x):
        ae = params["ae"] if "ae" in params else params
        if self.use_temporal_tiling and x.shape[1] > self.tile_sample_min_tsize:
            return self._temporal_tiled_moments(ae, x)
        if self.use_spatial_tiling and (
            x.shape[2] > self.tile_sample_min_size
            or x.shape[3] > self.tile_sample_min_size
        ):
            return self._spatial_tiled_moments(ae, x)
        return self.module.apply(
            ae, x, method=_HunyuanVAEModule.encode_moments
        )

    def encode_to_latents(self, params, x: jax.Array, rng: jax.Array):
        moments = self._encode_moments(params, x)
        dist = _moments_to_distribution(moments, self.latent_channels)
        return jax.lax.stop_gradient(dist.sample(rng))

    def decode_from_latents(self, params, z: jax.Array, **kwargs):
        ae = params["ae"] if "ae" in params else params
        if self.use_temporal_tiling and z.shape[1] > self.tile_latent_min_tsize:
            return self._temporal_tiled_decode(ae, z)
        if self.use_spatial_tiling and (
            z.shape[2] > self.tile_latent_min_size
            or z.shape[3] > self.tile_latent_min_size
        ):
            return self._spatial_tiled_decode(ae, z)
        return self.module.apply(ae, z, method=_HunyuanVAEModule.decode)

    # -- tiling (reference hunyuan.py:197-421) --------------------------------
    #
    # Tile loops are Python-level over static shapes, so under jit each
    # tile becomes one fused XLA subprogram; blending is a lerp over the
    # overlap band (reference blend_v/blend_h/blend_t).

    @staticmethod
    def _blend(a: jax.Array, b: jax.Array, axis: int, extent: int) -> jax.Array:
        extent = min(a.shape[axis], b.shape[axis], extent)
        if extent <= 0:
            return b
        ramp_shape = [1] * b.ndim
        ramp_shape[axis] = extent
        ramp = (jnp.arange(extent, dtype=b.dtype) / extent).reshape(ramp_shape)
        a_band = jax.lax.slice_in_dim(
            a, a.shape[axis] - extent, a.shape[axis], axis=axis
        )
        b_band = jax.lax.slice_in_dim(b, 0, extent, axis=axis)
        blended = a_band * (1 - ramp) + b_band * ramp
        rest = jax.lax.slice_in_dim(b, extent, b.shape[axis], axis=axis)
        return jnp.concatenate([blended, rest], axis=axis)

    def _spatial_tiled_moments(self, ae, x):
        overlap = int(self.tile_sample_min_size * (1 - self.tile_overlap_factor))
        blend = int(self.tile_latent_min_size * self.tile_overlap_factor)
        limit = self.tile_latent_min_size - blend
        rows = []
        for i in range(0, x.shape[2], overlap):
            row = []
            for j in range(0, x.shape[3], overlap):
                tile = x[
                    :, :,
                    i : i + self.tile_sample_min_size,
                    j : j + self.tile_sample_min_size,
                    :,
                ]
                row.append(
                    self.module.apply(
                        ae, tile, method=_HunyuanVAEModule.encode_moments
                    )
                )
            rows.append(row)
        out_rows = []
        for i, row in enumerate(rows):
            merged = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = self._blend(rows[i - 1][j], tile, axis=2, extent=blend)
                if j > 0:
                    tile = self._blend(merged[j - 1], tile, axis=3, extent=blend)
                merged.append(tile)
            out_rows.append(
                jnp.concatenate(
                    [t[:, :, :, :limit] for t in merged], axis=3
                )
            )
        return jnp.concatenate([r[:, :, :limit] for r in out_rows], axis=2)

    def _spatial_tiled_decode(self, ae, z):
        overlap = int(self.tile_latent_min_size * (1 - self.tile_overlap_factor))
        blend = int(self.tile_sample_min_size * self.tile_overlap_factor)
        limit = self.tile_sample_min_size - blend
        rows = []
        for i in range(0, z.shape[2], overlap):
            row = []
            for j in range(0, z.shape[3], overlap):
                tile = z[
                    :, :,
                    i : i + self.tile_latent_min_size,
                    j : j + self.tile_latent_min_size,
                    :,
                ]
                row.append(
                    self.module.apply(ae, tile, method=_HunyuanVAEModule.decode)
                )
            rows.append(row)
        out_rows = []
        for i, row in enumerate(rows):
            merged = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = self._blend(rows[i - 1][j], tile, axis=2, extent=blend)
                if j > 0:
                    tile = self._blend(merged[j - 1], tile, axis=3, extent=blend)
                merged.append(tile)
            out_rows.append(
                jnp.concatenate([t[:, :, :, :limit] for t in merged], axis=3)
            )
        return jnp.concatenate([r[:, :, :limit] for r in out_rows], axis=2)

    def _temporal_tiled_moments(self, ae, x):
        t = x.shape[1]
        overlap = int(self.tile_sample_min_tsize * (1 - self.tile_overlap_factor))
        blend = int(self.tile_latent_min_tsize * self.tile_overlap_factor)
        limit = self.tile_latent_min_tsize - blend
        tiles = []
        for i in range(0, t, overlap):
            tile = x[:, i : i + self.tile_sample_min_tsize + 1]
            if self.use_spatial_tiling and (
                tile.shape[2] > self.tile_sample_min_size
                or tile.shape[3] > self.tile_sample_min_size
            ):
                m = self._spatial_tiled_moments(ae, tile)
            else:
                m = self.module.apply(
                    ae, tile, method=_HunyuanVAEModule.encode_moments
                )
            if i > 0:
                m = m[:, 1:]
            tiles.append(m)
        merged = []
        for i, tile in enumerate(tiles):
            if i > 0:
                tile = self._blend(tiles[i - 1], tile, axis=1, extent=blend)
                merged.append(tile[:, :limit])
            else:
                merged.append(tile[:, : limit + 1])
        return jnp.concatenate(merged, axis=1)[:, : (t - 1) // 4 + 1]

    def _temporal_tiled_decode(self, ae, z):
        t = z.shape[1]
        overlap = int(self.tile_latent_min_tsize * (1 - self.tile_overlap_factor))
        blend = int(self.tile_sample_min_tsize * self.tile_overlap_factor)
        limit = self.tile_sample_min_tsize - blend
        tiles = []
        for i in range(0, t, overlap):
            tile = z[:, i : i + self.tile_latent_min_tsize + 1]
            if self.use_spatial_tiling and (
                tile.shape[2] > self.tile_latent_min_size
                or tile.shape[3] > self.tile_latent_min_size
            ):
                d = self._spatial_tiled_decode(ae, tile)
            else:
                d = self.module.apply(ae, tile, method=_HunyuanVAEModule.decode)
            if i > 0:
                d = d[:, 1:]
            tiles.append(d)
        merged = []
        for i, tile in enumerate(tiles):
            if i > 0:
                tile = self._blend(tiles[i - 1], tile, axis=1, extent=blend)
                merged.append(tile[:, :limit])
            else:
                merged.append(tile[:, : limit + 1])
        t_ratio = int(self._config.get("time_compression_ratio", 4))
        return jnp.concatenate(merged, axis=1)[:, : (t - 1) * t_ratio + 1]
