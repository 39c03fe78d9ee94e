"""Efficient UNet (Imagen) score network.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/efficient_unet.py:35-256 + layers/resnet.py:204-370
(Imagen appendix figs. A.27-A.29): D-Blocks downsample FIRST then run
time-free residual blocks (timestep added once at block entry), U-Blocks
mirror with upsampling LAST; residual branches use 1/sqrt(2) skip scaling;
skip connections concatenate D-block outputs into U-blocks (the deepest
level connects directly).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.config import (
    DotConfig,
    instantiate_from_config,
    instantiate_partial_from_config,
)
from xdiffusion_tpu.layers.embedding import LabelEmbeddingProjection, RunProjection
from xdiffusion_tpu.layers.resnet import nearest_upsample_2x


def _gn(c: int, name: str, silu: bool = False):
    from xdiffusion_tpu.layers.resnet import FastGroupNorm

    return FastGroupNorm(
        num_groups=32 if c % 32 == 0 else max(1, c // 4), silu=silu, name=name
    )


class ResnetBlockEfficient(nn.Module):
    """Time-free residual block with scaled skip (fig. A.27)."""

    dim_out: int
    dropout: float = 0.0
    scale_skip_connection: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c_in = x.shape[-1]
        h = nn.Conv(self.dim_out, (3, 3), name="conv1")(
            _gn(c_in, "norm1", silu=True)(x)
        )
        h = _gn(self.dim_out, "norm2", silu=True)(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            self.dim_out, (3, 3), kernel_init=nn.initializers.zeros, name="conv2"
        )(h)
        skip = nn.Conv(self.dim_out, (1, 1), name="skip")(x)
        out = skip + h
        if self.scale_skip_connection:
            out = out * 0.7071  # 1/sqrt(2), SR3/Imagen
        return out


class DBlock(nn.Module):
    """Downsample -> +time -> resblocks -> attention (fig. A.28)."""

    dim_out: int
    num_resnet_blocks: int
    downsample: bool = True
    dropout: float = 0.0
    attention_config: Optional[dict] = None

    @nn.compact
    def __call__(self, x, context: Dict, deterministic: bool = True):
        c_in = x.shape[-1]
        if self.downsample:
            # torch Conv2d(stride=2, padding=1) pads symmetrically; flax
            # 'SAME' would pad (0,1) and shift the sampling grid.
            x = nn.Conv(
                c_in, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), name="down_conv",
            )(x)

        emb = context["timestep_embedding"]
        if "class_embedding" in context:
            emb = emb + context["class_embedding"]
        emb_out = nn.Dense(c_in, name="emb_proj")(nn.silu(emb))
        h = x + emb_out[:, None, None, :]

        for i in range(self.num_resnet_blocks):
            h = ResnetBlockEfficient(
                dim_out=self.dim_out, dropout=self.dropout, name=f"res_{i}"
            )(h, deterministic=deterministic)

        if self.attention_config is not None:
            attn = instantiate_partial_from_config(dict(self.attention_config))(
                in_channels=self.dim_out, name="attn"
            )
            h = attn(h, context=context, deterministic=deterministic)
        return h


class UBlock(nn.Module):
    """+time -> resblocks -> attention -> upsample (fig. A.29)."""

    dim_out: int
    num_resnet_blocks: int
    upsample: bool = True
    dropout: float = 0.0
    attention_config: Optional[dict] = None

    @nn.compact
    def __call__(self, x, context: Dict, deterministic: bool = True):
        c_in = x.shape[-1]
        emb = context["timestep_embedding"]
        if "class_embedding" in context:
            emb = emb + context["class_embedding"]
        emb_out = nn.Dense(c_in, name="emb_proj")(nn.silu(emb))
        h = x + emb_out[:, None, None, :]

        for i in range(self.num_resnet_blocks):
            h = ResnetBlockEfficient(
                dim_out=self.dim_out, dropout=self.dropout, name=f"res_{i}"
            )(h, deterministic=deterministic)

        if self.attention_config is not None:
            attn = instantiate_partial_from_config(dict(self.attention_config))(
                in_channels=self.dim_out, name="attn"
            )
            h = attn(h, context=context, deterministic=deterministic)

        if self.upsample:
            h = nearest_upsample_2x(h)
            h = nn.Conv(self.dim_out, (3, 3), name="up_conv")(h)
        return h


class Unet(nn.Module):
    """Imagen Efficient UNet; instantiated with the params block struct."""

    config: Any

    def setup(self):
        cfg = self.config
        num_features = cfg.num_features
        mults = list(cfg.channel_multipliers)
        self._is_learned_sigma = bool(cfg.is_learned_sigma)
        self._output_channels = (
            cfg.input_channels * 2 if self._is_learned_sigma else cfg.output_channels
        )
        dropout = float(cfg.get("dropout", 0.0))
        time_emb_dim = num_features * 4

        projections = {}
        for name in cfg.conditioning.signals:
            projections[name] = instantiate_from_config(
                cfg.conditioning.projections[name].to_dict()
            )
        head_cfg = cfg.conditioning.context_transformer_head
        head_list = head_cfg if isinstance(head_cfg, list) else [head_cfg.to_dict()]
        self._context_heads = [instantiate_from_config(h) for h in head_list]
        for head in self._context_heads:
            if hasattr(head, "make_projection"):
                projections[head.projection_key] = head.make_projection()
        self._projections = projections

        if cfg.is_class_conditional:
            self._label_projection = LabelEmbeddingProjection(
                num_classes=cfg.num_classes, embedding_dim=time_emb_dim
            )

        s = cfg.input_spatial_size
        spatial = s if not isinstance(s, list) else s[0]
        attention_ds = [
            spatial // int(res) for res in cfg.attention.attention_resolutions
        ]
        attn_cfg = cfg.conditioning.context_transformer_layer.to_dict()

        num_resnet_blocks = cfg.num_resnet_blocks
        if not isinstance(num_resnet_blocks, list):
            num_resnet_blocks = [num_resnet_blocks] * len(mults)

        downs: List[nn.Module] = []
        skip_chans = [num_features]
        ch = num_features
        ds = 1
        for level, mult in enumerate(mults):
            downs.append(
                DBlock(
                    dim_out=mult * num_features,
                    num_resnet_blocks=num_resnet_blocks[level],
                    downsample=True,
                    dropout=dropout,
                    attention_config=attn_cfg if ds in attention_ds else None,
                    name=f"down_{level}",
                )
            )
            ch = mult * num_features
            if level != len(mults) - 1:
                ds *= 2
            skip_chans.append(ch)
        skip_chans.pop()  # deepest block connects directly

        ups: List[nn.Module] = []
        for level, mult in list(enumerate(mults))[::-1]:
            ups.append(
                UBlock(
                    dim_out=mult * num_features,
                    num_resnet_blocks=num_resnet_blocks[level] + 1,
                    upsample=True,
                    dropout=dropout,
                    attention_config=attn_cfg if ds in attention_ds else None,
                    name=f"up_{level}",
                )
            )
            ds //= 2
        self._downs = downs
        self._ups = ups
        self._initial_conv = nn.Conv(
            num_features, (3, 3), use_bias=False, name="initial_conv"
        )
        self._final_norm = _gn(num_features * mults[0], "final_norm", silu=True)
        self._final_conv = nn.Conv(
            self._output_channels, (3, 3), use_bias=False, name="final_conv"
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        context = dict(context)
        for head in self._context_heads:
            if (
                isinstance(head, (RunProjection, nn.Module))
                or hasattr(head, "projection_key")
            ):
                context = head(context, self._projections)
            else:
                context = head(context)
        if self.config.is_class_conditional and "classes" in context:
            context["class_embedding"] = self._label_projection(context["classes"])

        h = self._initial_conv(x)
        skips = []
        for block in self._downs:
            h = block(h, context=context, deterministic=deterministic)
            skips.append(h)
        skips.pop()  # deepest output feeds the first UBlock directly

        for idx, block in enumerate(self._ups):
            if idx > 0:
                h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = block(h, context=context, deterministic=deterministic)

        h = self._final_conv(self._final_norm(h))
        if self._is_learned_sigma:
            return tuple(jnp.split(h, 2, axis=-1))
        return h
