"""Causal 3D video VAEs (LTX-Video / HunyuanVideo latent spaces).

Behavioral counterpart of /root/reference/xdiffusion/autoencoders/
ltx_vae.py:81-1425 and hunyuan.py:34-1545: temporally-CAUSAL 3D
convolutions (first output frame depends only on the first input frame,
so images and videos share one latent space), spatio-temporal compression
with ceil(T/2) temporal strides (29 frames -> 15 -> 8 at 4x ratio, the
(T+1) convention), double-z gaussian moments with uniform or per-channel
log-variance.

One shared implementation, two config-compatible wrappers:
- `CausalVideoAutoencoder` (ltx_vae surface: encoder_blocks vocabulary
  [res_x | res_x_y | compress_all | compress_space | compress_time]);
- `HunyuanCausal3DVAE` (hunyuan surface: block_out_channels +
  time/spatial compression ratios).

Video layout: (B, F, H, W, C).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.autoencoders.base import VariationalAutoEncoder
from xdiffusion_tpu.autoencoders.distributions import DiagonalGaussianDistribution
from xdiffusion_tpu.config import DotConfig


class CausalConv3d(nn.Module):
    """3D conv, causal on the frame axis (left-pad only), SAME spatial."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel
        st, sh, sw = self.strides
        # Causal temporal pad; 'ceil' semantics for strided time so
        # T -> ceil(T/st) (keeps the +1 leading-frame convention).
        t = x.shape[1]
        pad_t = kt - 1
        extra_t = (-t) % st
        x = jnp.pad(
            x,
            ((0, 0), (pad_t, extra_t), (0, 0), (0, 0), (0, 0)),
            mode="edge",
        )
        return nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            name="conv",
        )(x)


def _norm(x: jax.Array, kind: str, name_scope) -> jax.Array:
    if kind == "pixel_norm":
        return x * jax.lax.rsqrt(
            jnp.mean(x**2, axis=-1, keepdims=True) + 1e-6
        )
    from xdiffusion_tpu.layers.resnet import FastGroupNorm

    c = x.shape[-1]
    groups = 32 if c % 32 == 0 else max(1, c // 4)
    return FastGroupNorm(num_groups=groups, name=name_scope)(x)


class CausalResBlock3D(nn.Module):
    features: int
    norm_layer: str = "group_norm"
    spatial_only: bool = False  # res_x_y: (1, 3, 3) kernels

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = (1, 3, 3) if self.spatial_only else (3, 3, 3)
        h = _norm(x, self.norm_layer, "norm1")
        h = CausalConv3d(self.features, kernel, name="conv1")(nn.silu(h))
        h = _norm(h, self.norm_layer, "norm2")
        h = CausalConv3d(self.features, kernel, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1), name="skip")(x)
        return x + h


class CausalUpsample(nn.Module):
    """Temporal+spatial (or spatial-only) 2x upsample + causal conv."""

    features: int
    temporal: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        if self.temporal:
            x = jnp.repeat(x, 2, axis=1)
        return CausalConv3d(self.features, (3, 3, 3), name="conv")(x)


class _CausalVAEModule(nn.Module):
    """Shared encoder/decoder; plan = list of (op, features) stages."""

    encoder_plan: Tuple
    decoder_plan: Tuple
    latent_channels: int
    out_channels: int
    base_features: int
    norm_layer: str = "group_norm"
    latent_log_var: str = "uniform"

    def setup(self):
        pass

    def _run_plan(self, x, plan, prefix):
        for i, (op, feat) in enumerate(plan):
            name = f"{prefix}_{i}_{op}"
            if op == "res_x":
                x = CausalResBlock3D(
                    features=feat, norm_layer=self.norm_layer, name=name
                )(x)
            elif op == "res_x_y":
                x = CausalResBlock3D(
                    features=feat,
                    norm_layer=self.norm_layer,
                    spatial_only=True,
                    name=name,
                )(x)
            elif op == "compress_all":
                x = CausalConv3d(feat, (3, 3, 3), strides=(2, 2, 2), name=name)(x)
            elif op == "compress_space":
                x = CausalConv3d(feat, (1, 3, 3), strides=(1, 2, 2), name=name)(x)
            elif op == "compress_time":
                x = CausalConv3d(feat, (3, 1, 1), strides=(2, 1, 1), name=name)(x)
            elif op == "upsample_all":
                x = CausalUpsample(features=feat, temporal=True, name=name)(x)
            elif op == "upsample_space":
                x = CausalUpsample(features=feat, temporal=False, name=name)(x)
            else:
                raise NotImplementedError(op)
        return x

    @nn.compact
    def encode_moments(self, x: jax.Array) -> jax.Array:
        h = CausalConv3d(self.base_features, (3, 3, 3), name="conv_in")(x)
        h = self._run_plan(h, self.encoder_plan, "enc")
        h = nn.silu(_norm(h, self.norm_layer, "enc_norm_out"))
        var_ch = 1 if self.latent_log_var == "uniform" else self.latent_channels
        return CausalConv3d(
            self.latent_channels + var_ch, (3, 3, 3), name="enc_out"
        )(h)

    @nn.compact
    def decode(self, z: jax.Array) -> jax.Array:
        h = CausalConv3d(self.decoder_plan[0][1], (3, 3, 3), name="dec_in")(z)
        h = self._run_plan(h, self.decoder_plan, "dec")
        h = nn.silu(_norm(h, self.norm_layer, "dec_norm_out"))
        return CausalConv3d(self.out_channels, (3, 3, 3), name="dec_out")(h)

    def __call__(self, x: jax.Array, rng: jax.Array):
        moments = self.encode_moments(x)
        dist = _moments_to_distribution(moments, self.latent_channels)
        z = dist.sample(rng)
        return self.decode(z), moments


def _moments_to_distribution(moments, latent_channels):
    mean = moments[..., :latent_channels]
    logvar = moments[..., latent_channels:]
    if logvar.shape[-1] == 1:
        logvar = jnp.broadcast_to(logvar, mean.shape)
    return DiagonalGaussianDistribution(
        jnp.concatenate([mean, logvar], axis=-1)
    )


class _CausalVAEBase(VariationalAutoEncoder):
    def __init__(self, module: _CausalVAEModule, config: DotConfig,
                 example_shape: Tuple[int, ...]):
        self._config = config
        self.module = module
        self._example_shape = example_shape
        from xdiffusion_tpu.config import instantiate_from_config

        self.loss_module = (
            instantiate_from_config(config.loss_config.to_dict())
            if "loss_config" in config
            else None
        )

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
                jnp.zeros(moments.shape), self.module.latent_channels
            )
            # Eager init: the posterior object is not a pytree, so the loss
            # module initializes outside jit (one-time cost). The decoder
            # ceil-pads time — crop the recon placeholder like
            # training_losses does.
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
        """VAE-GAN two-phase loss over (B, F, H, W, C) clips (same contract
        as AutoencoderKL.training_losses; reference video autoencoder
        trainer). The causal decoder may emit ceil-padded extra frames —
        the reconstruction is cropped back to the input length."""
        assert self.loss_module is not None, "config needs loss_config"
        rng_s = rng

        def forward(ae_params):
            recon, moments = self.module.apply(ae_params, inputs, rng_s)
            recon = recon[:, : inputs.shape[1]]
            return recon, _moments_to_distribution(
                moments, self.module.latent_channels
            )

        recon, posterior = forward(params["ae"])
        from xdiffusion_tpu.autoencoders.losses import maybe_adaptive_weight

        adaptive = maybe_adaptive_weight(
            self.loss_module, params, forward, inputs, global_step,
            optimizer_idx, "dec_out",
        )
        loss, logs = self.loss_module.apply(
            params["disc"], inputs, recon, posterior, optimizer_idx,
            global_step, adaptive_weight=adaptive,
        )
        return loss, logs

    def encode_to_latents(self, params, x: jax.Array, rng: jax.Array):
        moments = self.module.apply(
            params["ae"] if "ae" in params else params,
            x,
            method=_CausalVAEModule.encode_moments,
        )
        dist = _moments_to_distribution(
            moments, self.module.latent_channels
        )
        return jax.lax.stop_gradient(dist.sample(rng))

    def decode_from_latents(self, params, z: jax.Array, **kwargs):
        return self.module.apply(
            params["ae"] if "ae" in params else params,
            z,
            method=_CausalVAEModule.decode,
        )


class CausalVideoAutoencoder(_CausalVAEBase):
    """LTX-Video VAE surface (reference: autoencoders/ltx_vae.py:81)."""

    def __init__(self, config: DotConfig, **kwargs):
        enc_plan, dec_plan = [], []
        feat = 64
        for op, count in config.encoder_blocks:
            for _ in range(int(count)):
                if op.startswith("compress"):
                    feat = min(feat * 2, 512)
                    enc_plan.append((op, feat))
                else:
                    enc_plan.append((op, feat))
        dec_feat = feat
        for op, count in config.decoder_blocks:
            for _ in range(int(count)):
                if op.startswith("compress"):
                    # decoder mirrors compression with upsampling
                    up = "upsample_all" if op == "compress_all" else "upsample_space"
                    dec_feat = max(dec_feat // 2, 64)
                    dec_plan.append((up, dec_feat))
                else:
                    dec_plan.append((op, dec_feat))
        module = _CausalVAEModule(
            encoder_plan=tuple(enc_plan),
            decoder_plan=tuple(dec_plan),
            latent_channels=int(config.latent_channels),
            out_channels=int(config.out_channels),
            base_features=64,
            norm_layer=config.get("norm_layer", "group_norm"),
            latent_log_var=config.get("latent_log_var", "uniform"),
        )
        frames = int(config.get("input_number_of_frames", 25))
        super().__init__(
            module, config, (frames, 64, 64, int(config.in_channels))
        )


class HunyuanCausal3DVAE(_CausalVAEBase):
    """HunyuanVideo VAE surface (reference: autoencoders/hunyuan.py:34)."""

    def __init__(self, config: DotConfig, **kwargs):
        chans = list(config.block_out_channels)
        layers = int(config.get("layers_per_block", 2))
        import math

        t_downs = int(math.log2(int(config.get("time_compression_ratio", 4))))
        s_downs = int(
            math.log2(int(config.get("spatial_compression_ratio", 8)))
        )
        enc_plan: List = []
        for level, feat in enumerate(chans):
            for _ in range(layers):
                enc_plan.append(("res_x", feat))
            if level < len(chans) - 1:
                # spatial downsample at the first s_downs transitions,
                # temporal at the last t_downs of those.
                if level < s_downs:
                    op = (
                        "compress_all"
                        if level >= s_downs - t_downs
                        else "compress_space"
                    )
                    enc_plan.append((op, chans[level + 1]))
        dec_plan: List = []
        for level, feat in enumerate(reversed(chans)):
            for _ in range(layers):
                dec_plan.append(("res_x", feat))
            rev_level = len(chans) - 2 - level
            if rev_level >= 0 and rev_level < s_downs:
                op = (
                    "upsample_all"
                    if rev_level >= s_downs - t_downs
                    else "upsample_space"
                )
                dec_plan.append((op, list(reversed(chans))[level + 1]))
        module = _CausalVAEModule(
            encoder_plan=tuple(enc_plan),
            decoder_plan=tuple(dec_plan),
            latent_channels=int(config.latent_channels),
            out_channels=int(config.out_channels),
            base_features=chans[0],
            norm_layer="group_norm",
            latent_log_var=config.get("latent_logvar", "per_channel"),
        )
        frames = int(config.get("sample_tsize", 29))
        size = int(config.get("sample_size", 64))
        super().__init__(
            module, config, (frames, size, size, int(config.in_channels))
        )
