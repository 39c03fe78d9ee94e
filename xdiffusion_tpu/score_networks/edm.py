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
    """DDPM++/ADM sinusoidal embedding of the noise level
    (reference layers/edm.py:345-362; endpoint=True divides by half-1)."""

    num_channels: int
    max_positions: int = 10000
    endpoint: bool = False

    def __call__(self, x: jax.Array) -> jax.Array:
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32) / (
            half - (1 if self.endpoint else 0)
        )
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


def _edm_groups(c: int) -> int:
    """Reference GroupNorm group count: min(32, channels // 4)
    (layers/edm.py:160-162, min_channels_per_group=4)."""
    return max(1, min(32, c // 4))


class UNetBlockEDM(nn.Module):
    """Residual block with optional resampling + self-attention, the union
    of the DDPM++/NCSN++/ADM design points (reference layers/edm.py:218-342).

    adaptive_scale selects scale-shift (ADM) vs additive (DDPM++) timestep
    conditioning; skip_scale rescales the residual sum (sqrt(1/2) in the
    Song backbones); num_heads=1 for the Song backbones, out//64 for ADM;
    resample_proj=True gives resampling blocks a 1x1 skip projection even
    when channel counts match (Song convention).
    """

    out_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    adaptive_scale: bool = False
    resample_proj: bool = False
    eps: float = 1e-5
    resample_filter: Tuple[float, ...] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, emb: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        c_in = x.shape[-1]
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        h = FastGroupNorm(
            num_groups=_edm_groups(c_in), epsilon=self.eps, dtype=self.dtype,
            silu=True, name="norm0",
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
        norm1 = FastGroupNorm(
            num_groups=_edm_groups(self.out_channels), epsilon=self.eps,
            dtype=self.dtype, silu=True, name="norm1",
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

        # Skip projection rule (reference layers/edm.py:285-296): a 1x1
        # conv when channels change OR the block resamples with
        # resample_proj; resampling with matching channels and no proj is
        # the filter-only path (x already resampled above).
        if c_in != self.out_channels or (
            (self.up or self.down) and self.resample_proj
        ):
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        x = (x + h) * self.skip_scale

        if self.attention:
            b, hh, ww, cc = x.shape
            num_heads = (
                self.num_heads
                if self.num_heads is not None
                else max(1, cc // self.channels_per_head)
            )
            n = FastGroupNorm(
                num_groups=_edm_groups(cc), epsilon=self.eps,
                dtype=self.dtype, name="norm2",
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


class FusedDownConv(nn.Module):
    """Conv2d(kernel=3, down=True, fused_resample=True): 3x3 conv with
    widened padding, then depthwise filter at stride 2
    (reference layers/edm.py:125-132) — the NCSN++ residual-encoder aux
    projection."""

    out_channels: int
    resample_filter: Tuple[float, ...] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k2 = _make_filter_2d(self.resample_filter)
        f_pad = (k2.shape[0] - 1) // 2
        w_pad = 1  # 3x3 conv
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=w_pad + f_pad,
            dtype=self.dtype,
            name="conv",
        )(x)
        return _depthwise(h, k2, (2, 2), [(0, 0), (0, 0)])


class SongUNetModule(nn.Module):
    """Backbone covering DDPM++ and NCSN++ design points
    (reference: score_networks/edm.py:18-238). Sub-modules carry the
    reference's ModuleDict key names (enc_{res}x{res}_block{i}, ...) so
    torch-checkpoint import is a mechanical rename."""

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
        if self._encoder_type == "skip" or self._decoder_type == "skip":
            raise NotImplementedError(
                "encoder/decoder_type 'skip' is unused by the reference "
                "configs (all are standard/residual)"
            )

        if self._embedding_type == "fourier":
            self._noise_embed = FourierEmbedding(
                num_channels=self._noise_ch, name="map_noise"
            )
        else:
            # endpoint=True per reference score_networks/edm.py:81.
            self._noise_embed = PositionalEmbedding(
                num_channels=self._noise_ch, endpoint=True, name="map_noise"
            )
        self._map_layer0 = nn.Dense(self._emb_ch, name="map_layer0")
        self._map_layer1 = nn.Dense(self._emb_ch, name="map_layer1")
        # Label/augment projections land at NOISE-channel width and are
        # added before map_layer0 (reference :191-207).
        if self._label_dim:
            self._map_label = nn.Dense(self._noise_ch, name="map_label")
        if self._augment_dim:
            self._map_augment = nn.Dense(
                self._noise_ch, use_bias=False, name="map_augment"
            )

        def block(cout, name, **kw):
            # Song block kwargs (reference :65-77): num_heads=1, eps=1e-6,
            # resample_proj=True, additive conditioning.
            return UNetBlockEDM(
                out_channels=cout,
                dropout=self._dropout,
                skip_scale=skip_scale,
                adaptive_scale=False,
                num_heads=1,
                eps=1e-6,
                resample_proj=True,
                resample_filter=self._filter,
                name=name,
                **kw,
            )

        # Encoder: list of (kind, module) with reference-keyed names.
        enc = []
        cout = self._mc
        res = self._res
        enc.append(
            ("conv_in", nn.Conv(cout, (3, 3), name=f"enc_{res}x{res}_conv"))
        )
        for level, mult in enumerate(self._mults):
            res = self._res >> level
            if level > 0:
                enc.append(
                    ("down", block(cout, f"enc_{res}x{res}_down", down=True))
                )
                if self._encoder_type == "residual":
                    enc.append(
                        (
                            "aux_residual",
                            FusedDownConv(
                                out_channels=cout,
                                resample_filter=self._filter,
                                name=f"enc_{res}x{res}_aux_residual",
                            ),
                        )
                    )
            for i in range(self._num_blocks):
                cout = self._mc * mult
                enc.append(
                    (
                        "block",
                        block(
                            cout,
                            f"enc_{res}x{res}_block{i}",
                            attention=(res in self._attn_res),
                        ),
                    )
                )
        self._enc = enc

        # Decoder. Attention on the level-entry in0 block and ONLY the
        # last skip block of an attention resolution (reference :171).
        dec = []
        for level, mult in reversed(list(enumerate(self._mults))):
            res = self._res >> level
            if level == len(self._mults) - 1:
                dec.append(
                    ("block", block(cout, f"dec_{res}x{res}_in0", attention=True))
                )
                dec.append(("block", block(cout, f"dec_{res}x{res}_in1")))
            else:
                dec.append(("up", block(cout, f"dec_{res}x{res}_up", up=True)))
            for i in range(self._num_blocks + 1):
                cout = self._mc * mult
                attn = i == self._num_blocks and res in self._attn_res
                dec.append(
                    (
                        "skip_block",
                        block(cout, f"dec_{res}x{res}_block{i}", attention=attn),
                    )
                )
        self._dec = dec
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        self._out_norm = FastGroupNorm(
            num_groups=_edm_groups(cout),
            epsilon=1e-6,
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
        # Swap the cos/sin halves (reference :194-196).
        half = emb.shape[1] // 2
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=1)
        if self._label_dim and class_labels is not None:
            one_hot = jax.nn.one_hot(class_labels, self._label_dim)
            emb = emb + self._map_label(one_hot * math.sqrt(self._label_dim))
        if self._augment_dim and augment_labels is not None:
            emb = emb + self._map_augment(augment_labels)
        emb = nn.silu(self._map_layer0(emb))
        emb = nn.silu(self._map_layer1(emb))

        skips = []
        aux = x
        h = x
        for kind, mod in self._enc:
            if kind == "conv_in":
                h = mod(h)
                skips.append(h)
            elif kind == "aux_residual":
                # x = skips[-1] = aux = (x + conv(aux)) / sqrt(2)
                # (reference :217-218) — aux PROPAGATES the merged stream.
                h = (h + mod(aux)) * float(np.sqrt(0.5))
                aux = h
                skips[-1] = h
            else:  # down / block
                h = mod(h, emb, deterministic=deterministic)
                skips.append(h)

        for kind, mod in self._dec:
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
    (reference: score_networks/edm.py:241-399). Sub-modules carry the
    reference's ModuleDict key names for mechanical checkpoint import."""

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
        self._augment_dim = int(cfg.get("augment_dim", 0))
        self._res = int(cfg.img_resolution)
        self._out_channels = int(cfg.out_channels)

        self._noise_embed = PositionalEmbedding(
            num_channels=self._mc, name="map_noise"
        )
        self._map_layer0 = nn.Dense(self._emb_ch, name="map_layer0")
        self._map_layer1 = nn.Dense(self._emb_ch, name="map_layer1")
        if self._label_dim:
            # Linear on one-hot labels, no bias (reference :304-314).
            self._map_label = nn.Dense(
                self._emb_ch, use_bias=False, name="map_label"
            )
        if self._augment_dim:
            self._map_augment = nn.Dense(
                self._mc, use_bias=False, name="map_augment"
            )

        def block(cout, name, **kw):
            return UNetBlockEDM(
                out_channels=cout,
                dropout=self._dropout,
                skip_scale=1.0,
                adaptive_scale=True,
                channels_per_head=64,
                name=name,
                **kw,
            )

        enc = []
        cout = self._mc * self._mults[0]
        res = self._res
        enc.append(
            ("conv_in", nn.Conv(cout, (3, 3), name=f"enc_{res}x{res}_conv"))
        )
        for level, mult in enumerate(self._mults):
            res = self._res >> level
            if level > 0:
                enc.append(
                    ("down", block(cout, f"enc_{res}x{res}_down", down=True))
                )
            for i in range(self._num_blocks):
                cout = self._mc * mult
                enc.append(
                    (
                        "block",
                        block(
                            cout,
                            f"enc_{res}x{res}_block{i}",
                            attention=(res in self._attn_res),
                        ),
                    )
                )
        self._enc = enc

        dec = []
        for level, mult in reversed(list(enumerate(self._mults))):
            res = self._res >> level
            if level == len(self._mults) - 1:
                dec.append(
                    ("block", block(cout, f"dec_{res}x{res}_in0", attention=True))
                )
                dec.append(("block", block(cout, f"dec_{res}x{res}_in1")))
            else:
                dec.append(("up", block(cout, f"dec_{res}x{res}_up", up=True)))
            for i in range(self._num_blocks + 1):
                cout = self._mc * mult
                dec.append(
                    (
                        "skip_block",
                        block(
                            cout,
                            f"dec_{res}x{res}_block{i}",
                            attention=(res in self._attn_res),
                        ),
                    )
                )
        self._dec = dec
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        self._out_norm = FastGroupNorm(
            num_groups=_edm_groups(cout),
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
        if self._augment_dim and augment_labels is not None:
            emb = emb + self._map_augment(augment_labels)
        emb = nn.silu(self._map_layer0(emb))
        emb = self._map_layer1(emb)
        if self._label_dim and class_labels is not None:
            one_hot = jax.nn.one_hot(class_labels, self._label_dim)
            emb = emb + self._map_label(one_hot)
        emb = nn.silu(emb)

        skips = []
        h = x
        for kind, mod in self._enc:
            if kind == "conv_in":
                h = mod(h)
            else:
                h = mod(h, emb, deterministic=deterministic)
            skips.append(h)
        for kind, mod in self._dec:
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

        def inner(xx, cc):
            return self.module.apply(
                params,
                xx,
                cc["c_noise"],
                class_labels=cc.get("class_labels"),
                deterministic=deterministic,
                rngs=rngs,
            )

        ctx = {"c_noise": c_noise}
        if self.label_dim and class_labels is not None:
            ctx["class_labels"] = class_labels
        x_in = expand(c_in) * x
        if deterministic:
            # Large sampling batches run in <=64-sample lax.map chunks so
            # XLA keeps the channels-minor conv layout (ops/batch_chunk.py
            # has the measured root cause). Deterministic-only: chunking
            # would reuse the dropout rng across chunks.
            from xdiffusion_tpu.ops.batch_chunk import chunk_batched_apply

            fx = chunk_batched_apply(inner, x_in, ctx)
        else:
            fx = inner(x_in, ctx)
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
