"""Space-time factorized video UNet ("Video Diffusion Models").

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/unet_3d.py:27-380: a 2D UNet whose convolutions/spatial
attention run per-frame (frames folded into the batch — pure reshape, no
data movement on TPU) with temporal self-attention blocks interleaved at
the configured attention resolutions.

Video layout: (B, F, H, W, C).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.config import (
    DotConfig,
    instantiate_from_config,
    instantiate_partial_from_config,
)
from xdiffusion_tpu.layers.embedding import LabelEmbeddingProjection, RunProjection
from xdiffusion_tpu.layers.resnet import (
    Downsample,
    ResnetBlockBigGAN,
    ResnetBlockDDPM,
    Upsample,
)


def _fold(x: jax.Array) -> Tuple[jax.Array, int]:
    """(B, F, H, W, C) -> (B*F, H, W, C)."""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c), f


def _unfold(x: jax.Array, f: int) -> jax.Array:
    bf, h, w, c = x.shape
    return x.reshape(bf // f, f, h, w, c)


def _tile_context_over_frames(context: Dict, f: int) -> Dict:
    """Per-example conditioning repeats per frame when frames fold into
    the batch axis."""
    out = dict(context)
    for key in (
        "timestep_embedding",
        "class_embedding",
        "context_embedding",
        "text_embeddings",
        "t5_text_embeddings",
        "clip_text_embeddings",
        "pooled_text_embeddings",
    ):
        if key in out:
            out[key] = jnp.repeat(out[key], f, axis=0)
    return out


class Unet(nn.Module):
    """Video UNet; instantiated with the params block as a DotConfig."""

    config: Any

    def setup(self):
        cfg = self.config
        num_features = cfg.num_features
        channel_multipliers = list(cfg.channel_multipliers)
        self._is_learned_sigma = bool(cfg.is_learned_sigma)
        self._output_channels = (
            cfg.input_channels * 2 if self._is_learned_sigma else cfg.output_channels
        )
        self._num_frames = int(cfg.input_number_of_frames)
        dropout = float(cfg.dropout) if "dropout" in cfg else 0.0

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
                num_classes=cfg.num_classes, embedding_dim=num_features * 4
            )

        spatial_attn_ctor = instantiate_partial_from_config(
            cfg.conditioning.spatial_context_transformer_layer.to_dict()
        )
        temporal_attn_ctor = instantiate_partial_from_config(
            cfg.conditioning.temporal_context_transformer_layer.to_dict()
        )

        s = cfg.input_spatial_size
        spatial = [s[0], s[1]] if isinstance(s, list) else [s, s]
        attention_ds = [
            spatial[1] // int(res) for res in cfg.attention_resolutions
        ]

        num_resnet_blocks = cfg.num_resnet_blocks
        if not isinstance(num_resnet_blocks, list):
            num_resnet_blocks = [num_resnet_blocks] * len(channel_multipliers)
        use_ss = bool(cfg.use_scale_shift_norm)
        resamp_conv = bool(cfg.resamp_with_conv)
        updown = bool(cfg.resblock_updown)
        block_type = cfg.resnet_block_type if "resnet_block_type" in cfg else "biggan"
        # Video blocks always condition through the Mlp stack (reference
        # layers/resnet_3d.py defaults mlp_layers=1; VDM configs use 2).
        mlp_layers = int(cfg.mlp_layers) if "mlp_layers" in cfg else 1

        def res_block(dim_out, **kw):
            if block_type == "biggan":
                return ResnetBlockBigGAN(
                    dim_out=dim_out,
                    use_scale_shift_norm=use_ss,
                    use_conv=resamp_conv,
                    dropout=dropout,
                    emb_mlp_layers=mlp_layers,
                    stat_frames=self._num_frames,
                    **kw,
                )
            return ResnetBlockDDPM(
                dim_out=dim_out,
                use_scale_shift_norm=use_ss,
                dropout=dropout,
                emb_mlp_layers=mlp_layers,
                stat_frames=self._num_frames,
            )

        def attn_pair(ch):
            return [
                ("attn_s", spatial_attn_ctor(in_channels=ch)),
                ("attn_t", temporal_attn_ctor(in_channels=ch)),
            ]

        downs: List[List[Tuple[str, nn.Module]]] = []
        ch = num_features
        ds = 1
        for level, mult in enumerate(channel_multipliers):
            for _ in range(num_resnet_blocks[level]):
                stage = [("res", res_block(mult * num_features))]
                ch = mult * num_features
                if ds in attention_ds:
                    stage.extend(attn_pair(ch))
                downs.append(stage)
            if level != len(channel_multipliers) - 1:
                if updown:
                    downs.append([("res", res_block(ch, down=True))])
                else:
                    downs.append(
                        [("down", Downsample(channels=ch, with_conv=resamp_conv))]
                    )
                ds *= 2

        middle: List[Tuple[str, nn.Module]] = [
            ("res", res_block(ch)),
            *attn_pair(ch),
            ("res", res_block(ch)),
        ]

        ups: List[List[Tuple[str, nn.Module]]] = []
        for level, mult in list(enumerate(channel_multipliers))[::-1]:
            for i in range(num_resnet_blocks[level] + 1):
                stage = [("res", res_block(num_features * mult))]
                ch = num_features * mult
                if ds in attention_ds:
                    stage.extend(attn_pair(ch))
                if level and i == num_resnet_blocks[level]:
                    if updown:
                        stage.append(("res_up", res_block(ch, up=True)))
                    else:
                        stage.append(
                            ("up", Upsample(channels=ch, with_conv=resamp_conv))
                        )
                    ds //= 2
                ups.append(stage)

        self._downs = downs
        self._middle = middle
        self._ups = ups
        self._initial_conv = nn.Conv(
            num_features * channel_multipliers[0],
            (3, 3),
            use_bias=False,
            name="initial_conv",
        )
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        self._final_norm = FastGroupNorm(
            num_groups=32 if num_features % 32 == 0 else max(1, num_features // 4),
            silu=True,
            stat_frames=self._num_frames,
            name="final_norm",
        )
        self._final_conv = nn.Conv(
            self._output_channels, (3, 3), use_bias=False, name="final_conv"
        )

    def _apply_stage(
        self, stage, h, f, folded_context, context, deterministic, stage_id=0
    ):
        for kind, mod in stage:
            if kind in ("res", "res_up"):
                h = mod(h, context=folded_context, deterministic=deterministic)
            elif kind == "attn_s":
                h = mod(h, context=folded_context, deterministic=deterministic)
            elif kind == "attn_t":
                h = _fold(
                    mod(_unfold(h, f), context=context, deterministic=deterministic)
                )[0]
            else:
                h = mod(h)
        return self._post_stage(h, f, stage_id)

    def _post_stage(self, h, f, stage_id):
        """Hook for variants that add per-stage temporal mixing
        (pseudo-3D convs, motion modules)."""
        return h

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, F, H, W, C)."""
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

        h, f = _fold(x)
        folded_context = _tile_context_over_frames(context, f)
        h = self._initial_conv(h)
        hs = [h]
        stage_id = 0
        for stage in self._downs:
            h = self._apply_stage(
                stage, h, f, folded_context, context, deterministic, stage_id
            )
            hs.append(h)
            stage_id += 1
        h = self._apply_stage(
            self._middle, h, f, folded_context, context, deterministic, stage_id
        )
        stage_id += 1
        for stage in self._ups:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._apply_stage(
                stage, h, f, folded_context, context, deterministic, stage_id
            )
            stage_id += 1

        h = self._final_conv(self._final_norm(h))
        h = _unfold(h, f)
        if self._is_learned_sigma:
            return tuple(jnp.split(h, 2, axis=-1))
        return h
