"""EDM score networks: SongUNet / DhariwalUNet backbones + preconditioners.

Behavioral counterpart of the reference EDM module
(/root/reference/xdiffusion/score_networks/edm.py:18-700, "Elucidating the
Design Space of Diffusion-Based Generative Models"): the VP/VE/iDDPM/EDM
preconditioning wrappers compute c_skip/c_out/c_in/c_noise around a
backbone UNet, and the backbones cover the DDPM++ (positional embedding,
standard encoder), NCSN++ (Fourier embedding, residual encoder with input
skips), and ADM (adaptive scale-shift) design points.

TPU-native: NHWC layout, filtered up/down-sampling as depthwise convs,
attention through the ops dispatcher, fp32 parameter math with an optional
bf16 activation policy. Preconditioners are thin functional wrappers (not
modules) so sigma math stays in fp32 regardless of the backbone policy.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xdiffusion_tpu.config import DotConfig, instantiate_from_config


# ---------------------------------------------------------------------------
# Noise-level embeddings
# ---------------------------------------------------------------------------


class PositionalEmbedding(nn.Module):
    """DDPM++ sinusoidal embedding of the noise level."""

    num_channels: int
    max_positions: int = 10000

    def __call__(self, x: jax.Array) -> jax.Array:
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32) / half
        freqs = (1.0 / self.max_positions) ** freqs
        args = x[:, None].astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


class FourierEmbedding(nn.Module):
    """NCSN++ random Fourier features (fixed gaussian frequencies)."""

    num_channels: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        freqs = self.param(
            "freqs",
            lambda key: jax.random.normal(key, (self.num_channels // 2,))
            * self.scale,
        )
        freqs = jax.lax.stop_gradient(freqs)
        args = 2.0 * math.pi * x[:, None].astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


# ---------------------------------------------------------------------------
# Filtered resampling (depthwise convs)
# ---------------------------------------------------------------------------


def _make_filter_2d(f: Sequence[float]) -> np.ndarray:
    f = np.asarray(f, dtype=np.float32)
    f = f / f.sum()
    return np.outer(f, f)


def _depthwise(x: jax.Array, k2: np.ndarray, strides, padding, lhs_dilation=None):
    c = x.shape[-1]
    kernel = jnp.broadcast_to(
        jnp.asarray(k2)[:, :, None, None], (k2.shape[0], k2.shape[1], 1, c)
    )
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def resample_down(x: jax.Array, filt: Sequence[float]) -> jax.Array:
    k2 = _make_filter_2d(filt)
    pad = (k2.shape[0] - 1) // 2
    return _depthwise(x, k2, (2, 2), [(pad, pad), (pad, pad)])


def resample_up(x: jax.Array, filt: Sequence[float]) -> jax.Array:
    k2 = _make_filter_2d(filt) * 4.0  # preserve magnitude after zero-insert
    p = k2.shape[0] // 2
    return _depthwise(
        x, k2, (1, 1), [(p, p), (p, p)], lhs_dilation=(2, 2)
    )


# ---------------------------------------------------------------------------
# UNet block
# ---------------------------------------------------------------------------


class UNetBlockEDM(nn.Module):
    """Residual block with optional resampling + self-attention.

    adaptive_scale selects scale-shift (ADM) vs additive (DDPM++) timestep
    conditioning; skip_scale rescales the residual sum (sqrt(1/2) in the
    Song backbones).
    """

    out_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    adaptive_scale: bool = False
    resample_filter: Tuple[float, ...] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, emb: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        c_in = x.shape[-1]
        groups = 32 if c_in % 32 == 0 else max(1, c_in // 4)
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        h = FastGroupNorm(
            num_groups=groups, dtype=self.dtype, silu=True, name="norm0"
        )(x)
        if self.up:
            h = resample_up(h, self.resample_filter)
            x = resample_up(x, self.resample_filter)
        elif self.down:
            h = resample_down(h, self.resample_filter)
            x = resample_down(x, self.resample_filter)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv0")(h)

        emb_dim = 2 * self.out_channels if self.adaptive_scale else self.out_channels
        emb_out = nn.Dense(emb_dim, dtype=self.dtype, name="affine")(emb)[
            :, None, None, :
        ]
        groups_out = (
            32 if self.out_channels % 32 == 0 else max(1, self.out_channels // 4)
        )
        norm1 = FastGroupNorm(
            num_groups=groups_out, dtype=self.dtype, silu=True, name="norm1"
        )
        if self.adaptive_scale:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = norm1(h, t_scale=scale, t_shift=shift)
        else:
            h = norm1(h + emb_out)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv1",
        )(h)

        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        x = (x + h) * self.skip_scale

        if self.attention:
            b, hh, ww, cc = x.shape
            num_heads = max(1, cc // self.channels_per_head)
            n = FastGroupNorm(
                num_groups=groups_out, dtype=self.dtype, name="norm2"
            )(x)
            qkv = nn.Dense(3 * cc, dtype=self.dtype, name="qkv")(
                n.reshape(b, hh * ww, cc)
            )
            q, k, v = jnp.split(qkv, 3, axis=-1)
            from xdiffusion_tpu.ops import attention_qkv

            a = attention_qkv(q, k, v, heads=num_heads)
            a = nn.Dense(
                cc, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="proj"
            )(a)
            x = (x + a.reshape(b, hh, ww, cc)) * self.skip_scale
        return x


# ---------------------------------------------------------------------------
# SongUNet (DDPM++ / NCSN++)
# ---------------------------------------------------------------------------


class SongUNetModule(nn.Module):
    """Backbone covering DDPM++ and NCSN++ design points
    (reference: score_networks/edm.py:18-240)."""

    config: Any  # DotConfig of params

    def setup(self):
        cfg = self.config
        self._mc = int(cfg.model_channels)
        self._emb_ch = self._mc * int(cfg.get("channel_mult_emb", 4))
        self._noise_ch = self._mc * int(cfg.get("channel_mult_noise", 1))
        self._mults = list(cfg.channel_mult)
        self._num_blocks = int(cfg.get("num_blocks", 4))
        self._attn_res = list(cfg.get("attn_resolutions", []) or [])
        self._dropout = float(cfg.get("dropout", 0.10))
        self._label_dim = int(cfg.get("label_dim", 0))
        self._augment_dim = int(cfg.get("augment_dim", 0))
        self._embedding_type = cfg.get("embedding_type", "positional")
        self._encoder_type = cfg.get("encoder_type", "standard")
        self._decoder_type = cfg.get("decoder_type", "standard")
        self._filter = tuple(cfg.get("resample_filter", [1, 1]))
        self._res = int(cfg.img_resolution)
        self._out_channels = int(cfg.out_channels)
        skip_scale = float(np.sqrt(0.5))

        if self._embedding_type == "fourier":
            self._noise_embed = FourierEmbedding(num_channels=self._noise_ch)
        else:
            self._noise_embed = PositionalEmbedding(num_channels=self._noise_ch)
        self._map_layer0 = nn.Dense(self._emb_ch, name="map_layer0")
        self._map_layer1 = nn.Dense(self._emb_ch, name="map_layer1")
        if self._label_dim:
            self._map_label = nn.Dense(self._emb_ch, use_bias=False, name="map_label")
        if self._augment_dim:
            self._map_augment = nn.Dense(
                self._emb_ch, use_bias=False, name="map_augment"
            )

        def block(cout, **kw):
            return UNetBlockEDM(
                out_channels=cout,
                dropout=self._dropout,
                skip_scale=skip_scale,
                adaptive_scale=False,
                resample_filter=self._filter,
                **kw,
            )

        # Encoder: list of (kind, module, res) where kind in
        # {conv_in, block, down, aux_skip}.
        enc = []
        cout = self._mc
        res = self._res
        enc.append(("conv_in", nn.Conv(cout, (3, 3), name="enc_conv_in"), res))
        skips_ch = [cout]
        for level, mult in enumerate(self._mults):
            if level > 0:
                res //= 2
                enc.append(("down", block(cout, down=True), res))
                skips_ch.append(cout)
                if self._encoder_type == "residual":
                    enc.append(
                        (
                            "aux_skip",
                            nn.Conv(cout, (1, 1), name=f"enc_aux_{res}"),
                            res,
                        )
                    )
            for i in range(self._num_blocks):
                cout = self._mc * mult
                enc.append(
                    ("block", block(cout, attention=(res in self._attn_res)), res)
                )
                skips_ch.append(cout)
        self._enc = enc

        # Decoder.
        dec = []
        for level, mult in reversed(list(enumerate(self._mults))):
            if level == len(self._mults) - 1:
                dec.append(("block", block(cout, attention=True), res))
                dec.append(("block", block(cout), res))
            else:
                res *= 2
                dec.append(("up", block(cout, up=True), res))
            for i in range(self._num_blocks + 1):
                cout = self._mc * mult
                dec.append(
                    (
                        "skip_block",
                        block(cout, attention=(res in self._attn_res)),
                        res,
                    )
                )
        self._dec = dec
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        self._out_norm = FastGroupNorm(
            num_groups=32 if cout % 32 == 0 else max(1, cout // 4),
            silu=True,
            name="out_norm",
        )
        self._out_conv = nn.Conv(
            self._out_channels,
            (3, 3),
            kernel_init=nn.initializers.zeros,
            name="out_conv",
        )

    def __call__(
        self,
        x: jax.Array,
        noise_labels: jax.Array,
        class_labels: Optional[jax.Array] = None,
        augment_labels: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        emb = self._noise_embed(noise_labels)
        emb = nn.silu(self._map_layer0(emb))
        if self._label_dim and class_labels is not None:
            one_hot = jax.nn.one_hot(class_labels, self._label_dim)
            emb = emb + self._map_label(one_hot * math.sqrt(self._label_dim))
        if self._augment_dim and augment_labels is not None:
            emb = emb + self._map_augment(augment_labels)
        emb = nn.silu(self._map_layer1(emb))

        skips = []
        aux = x
        h = x
        for kind, mod, res in self._enc:
            if kind == "conv_in":
                h = mod(h)
                skips.append(h)
            elif kind == "down":
                h = mod(h, emb, deterministic=deterministic)
                skips.append(h)
            elif kind == "aux_skip":
                aux = resample_down(aux, self._filter)
                h = (h + mod(aux)) * float(np.sqrt(0.5))
                skips[-1] = h
            else:  # block
                h = mod(h, emb, deterministic=deterministic)
                skips.append(h)

        for kind, mod, res in self._dec:
            if kind == "skip_block":
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = mod(h, emb, deterministic=deterministic)
            else:  # block / up
                h = mod(h, emb, deterministic=deterministic)
        return self._out_conv(self._out_norm(h)).astype(jnp.float32)


def SongUNet(**params) -> SongUNetModule:
    """Config factory (reference target xdiffusion.score_networks.edm.SongUNet)."""
    return SongUNetModule(config=DotConfig(params))


class DhariwalUNetModule(nn.Module):
    """ADM backbone: adaptive scale-shift conditioning
    (reference: score_networks/edm.py:241-400)."""

    config: Any

    def setup(self):
        cfg = self.config
        self._mc = int(cfg.model_channels)
        self._emb_ch = self._mc * int(cfg.get("channel_mult_emb", 4))
        self._mults = list(cfg.channel_mult)
        self._num_blocks = int(cfg.get("num_blocks", 3))
        self._attn_res = list(cfg.get("attn_resolutions", []) or [])
        self._dropout = float(cfg.get("dropout", 0.10))
        self._label_dim = int(cfg.get("label_dim", 0))
        self._res = int(cfg.img_resolution)
        self._out_channels = int(cfg.out_channels)

        self._noise_embed = PositionalEmbedding(num_channels=self._mc)
        self._map_layer0 = nn.Dense(self._emb_ch, name="map_layer0")
        self._map_layer1 = nn.Dense(self._emb_ch, name="map_layer1")
        if self._label_dim:
            self._label_embed = nn.Embed(
                self._label_dim + 1, self._emb_ch, name="map_label"
            )

        def block(cout, **kw):
            return UNetBlockEDM(
                out_channels=cout,
                dropout=self._dropout,
                skip_scale=1.0,
                adaptive_scale=True,
                channels_per_head=64,
                **kw,
            )

        enc = []
        cout = self._mc
        res = self._res
        enc.append(("conv_in", nn.Conv(cout, (3, 3), name="enc_conv_in"), res))
        for level, mult in enumerate(self._mults):
            if level > 0:
                res //= 2
                enc.append(("down", block(cout, down=True), res))
            for i in range(self._num_blocks):
                cout = self._mc * mult
                enc.append(
                    ("block", block(cout, attention=(res in self._attn_res)), res)
                )
        self._enc = enc

        dec = []
        for level, mult in reversed(list(enumerate(self._mults))):
            if level == len(self._mults) - 1:
                dec.append(("block", block(cout, attention=True), res))
                dec.append(("block", block(cout), res))
            else:
                res *= 2
                dec.append(("up", block(cout, up=True), res))
            for i in range(self._num_blocks + 1):
                cout = self._mc * mult
                dec.append(
                    (
                        "skip_block",
                        block(cout, attention=(res in self._attn_res)),
                        res,
                    )
                )
        self._dec = dec
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        self._out_norm = FastGroupNorm(
            num_groups=32 if cout % 32 == 0 else max(1, cout // 4),
            silu=True,
            name="out_norm",
        )
        self._out_conv = nn.Conv(
            self._out_channels,
            (3, 3),
            kernel_init=nn.initializers.zeros,
            name="out_conv",
        )

    def __call__(
        self,
        x: jax.Array,
        noise_labels: jax.Array,
        class_labels: Optional[jax.Array] = None,
        augment_labels: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        emb = self._noise_embed(noise_labels)
        emb = nn.silu(self._map_layer0(emb))
        emb = self._map_layer1(emb)
        if self._label_dim and class_labels is not None:
            emb = emb + self._label_embed(class_labels.astype(jnp.int32))
        emb = nn.silu(emb)

        skips = []
        h = x
        for kind, mod, res in self._enc:
            if kind == "conv_in":
                h = mod(h)
            else:
                h = mod(h, emb, deterministic=deterministic)
            skips.append(h)
        for kind, mod, res in self._dec:
            if kind == "skip_block":
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = mod(h, emb, deterministic=deterministic)
            else:
                h = mod(h, emb, deterministic=deterministic)
        return self._out_conv(self._out_norm(h)).astype(jnp.float32)


def DhariwalUNet(**params) -> DhariwalUNetModule:
    return DhariwalUNetModule(config=DotConfig(params))


# ---------------------------------------------------------------------------
# Preconditioning wrappers
# ---------------------------------------------------------------------------


class _Precond:
    """Functional preconditioner: D(x, sigma) = c_skip*x + c_out*F(c_in*x,
    c_noise) (EDM paper Table 1). Holds the backbone module; parameters are
    threaded explicitly. sigma math in fp32."""

    def __init__(self, model: Dict, label_dim: int = 0, **_):
        self.module = instantiate_from_config(model)
        self.label_dim = int(label_dim)
        self.sigma_min = 0.0
        self.sigma_max = float("inf")

    # -- per-formulation coefficients ------------------------------------

    def coefficients(self, sigma: jax.Array):
        raise NotImplementedError

    def round_sigma(self, sigma):
        return jnp.asarray(sigma, dtype=jnp.float32)

    def init(self, rng: jax.Array, x: jax.Array, sigma: jax.Array):
        c_skip, c_out, c_in, c_noise = self.coefficients(sigma)
        # Trace the label branch at init so its params exist even when
        # sampling later runs unconditional.
        labels = (
            jnp.zeros((x.shape[0],), dtype=jnp.int32) if self.label_dim else None
        )
        return jax.jit(self.module.init)(rng, x, c_noise, class_labels=labels)

    def apply(
        self,
        params,
        x: jax.Array,
        sigma: jax.Array,
        class_labels: Optional[jax.Array] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        sigma = jnp.broadcast_to(
            jnp.asarray(sigma, dtype=jnp.float32).reshape(-1), (x.shape[0],)
        )
        c_skip, c_out, c_in, c_noise = self.coefficients(sigma)
        expand = lambda c: c.reshape((-1,) + (1,) * (x.ndim - 1))
        rngs = {"dropout": rng} if rng is not None else None
        fx = self.module.apply(
            params,
            (expand(c_in) * x),
            c_noise,
            class_labels=class_labels if self.label_dim else None,
            deterministic=deterministic,
            rngs=rngs,
        )
        return expand(c_skip) * x + expand(c_out) * fx


class VPPrecond(_Precond):
    """Variance-preserving (DDPM) preconditioning
    (reference: edm.py:402-480)."""

    def __init__(
        self,
        beta_d: float = 19.9,
        beta_min: float = 0.1,
        M: int = 1000,
        epsilon_t: float = 1e-5,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.beta_d = float(beta_d)
        self.beta_min = float(beta_min)
        self.M = int(M)
        self.epsilon_t = float(epsilon_t)
        self.sigma_min = float(self.sigma(epsilon_t))
        self.sigma_max = float(self.sigma(1.0))

    def sigma(self, t):
        t = jnp.asarray(t, dtype=jnp.float32)
        return jnp.sqrt(jnp.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0)

    def sigma_inv(self, sigma):
        sigma = jnp.asarray(sigma, dtype=jnp.float32)
        return (
            jnp.sqrt(self.beta_min**2 + 2 * self.beta_d * jnp.log1p(sigma**2))
            - self.beta_min
        ) / self.beta_d

    def coefficients(self, sigma):
        sigma = jnp.asarray(sigma, dtype=jnp.float32)
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = (self.M - 1) * self.sigma_inv(sigma)
        return c_skip, c_out, c_in, c_noise


class VEPrecond(_Precond):
    """Variance-exploding (SMLD/NCSN) preconditioning
    (reference: edm.py:483-545)."""

    def __init__(self, sigma_min: float = 0.02, sigma_max: float = 100.0, **kwargs):
        super().__init__(**kwargs)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)

    def coefficients(self, sigma):
        sigma = jnp.asarray(sigma, dtype=jnp.float32)
        c_skip = jnp.ones_like(sigma)
        c_out = sigma
        c_in = jnp.ones_like(sigma)
        c_noise = jnp.log(0.5 * sigma)
        return c_skip, c_out, c_in, c_noise


class iDDPMPrecond(_Precond):
    """Improved-DDPM preconditioning with the cosine alpha-bar sigma table
    (reference: edm.py:547-633)."""

    def __init__(self, C_1: float = 0.001, C_2: float = 0.008, M: int = 1000, **kwargs):
        super().__init__(**kwargs)
        self.C_1 = float(C_1)
        self.C_2 = float(C_2)
        self.M = int(M)
        # u table: u[M] ~ 0, built backwards per iDDPM.
        u = np.zeros(M + 1, dtype=np.float64)
        alpha_bar = lambda j: np.sin(0.5 * np.pi * j / (M * (C_2 + 1))) ** 2
        for j in range(M, 0, -1):
            u[j - 1] = np.sqrt(
                (u[j] ** 2 + 1.0) / max(alpha_bar(j - 1) / alpha_bar(j), C_1) - 1.0
            )
        self.u = jnp.asarray(u, dtype=jnp.float32)
        self.sigma_min = float(u[M - 1])
        self.sigma_max = float(u[0])

    def round_sigma(self, sigma, return_index: bool = False):
        sigma = jnp.asarray(sigma, dtype=jnp.float32).reshape(-1)
        index = jnp.argmin(
            jnp.abs(sigma[:, None] - self.u[None, :]), axis=1
        )
        return index if return_index else jnp.take(self.u, index)

    def coefficients(self, sigma):
        sigma = jnp.asarray(sigma, dtype=jnp.float32)
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = (
            self.M - 1 - self.round_sigma(sigma, return_index=True)
        ).astype(jnp.float32)
        return c_skip, c_out, c_in, c_noise


class EDMPrecond(_Precond):
    """EDM preconditioning (reference: edm.py:635-697)."""

    def __init__(
        self,
        sigma_min: float = 0.0,
        sigma_max: float = float("inf"),
        sigma_data: float = 0.5,
        **kwargs,
    ):
        kwargs.pop("img_resolution", None)
        kwargs.pop("img_channels", None)
        kwargs.pop("use_fp16", None)
        super().__init__(**kwargs)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.sigma_data = float(sigma_data)

    def coefficients(self, sigma):
        sigma = jnp.asarray(sigma, dtype=jnp.float32)
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sd2 + sigma**2)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise
