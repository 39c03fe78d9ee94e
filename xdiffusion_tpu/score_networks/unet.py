"""DDPM/GLIDE-style UNet epsilon-prediction network.

Config-compatible counterpart of the reference UNet
(/root/reference/xdiffusion/score_networks/unet.py:35-299): a pyramid of
residual blocks (DDPM or BigGAN style) with self/cross attention at the
configured resolutions, conditioned through a projection dict + context
transformer head (the reference's GLIDE-style conditioning scheme).

TPU-native choices: NHWC feature maps, skip connections concatenated on
the trailing (lane) axis, attention through the ops dispatcher, and a
purely functional context dict so the whole forward pass traces into one
XLA program.
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


class Unet(nn.Module):
    """Time-dependent score network on a U-Net backbone.

    Instantiated with `instantiate_with_config_struct` semantics: the
    whole score_network params block arrives as a DotConfig.
    """

    config: Any  # DotConfig of score_network.params (static)

    @nn.nowrap
    def _net_config(self):
        """The config subtree describing the 2D backbone. Video wrappers
        (Video-LDM, AnimateDiff) override this to point at their nested
        `spatial_score_network` block (reference video_ldm.py:150,
        animate_diff.py:213). `nowrap` keeps this helper out of flax's
        method interception (so e.g. nn.tabulate doesn't render it as a
        layer row)."""
        return self.config

    def setup(self):
        cfg = self._net_config()
        # Compute dtype policy: params stay float32, activations/matmuls run
        # in bfloat16 when configured (MXU-native). Output is upcast to f32.
        dt = jnp.bfloat16 if cfg.get("dtype", "float32") == "bfloat16" else jnp.float32
        self._dtype = dt
        num_features = cfg.num_features
        channel_multipliers = list(cfg.channel_multipliers)
        channels = [num_features * m for m in channel_multipliers]
        self._is_learned_sigma = bool(cfg.is_learned_sigma)
        self._output_channels = (
            cfg.input_channels * 2 if self._is_learned_sigma else cfg.output_channels
        )
        dropout = float(cfg.dropout) if "dropout" in cfg else 0.0

        # Conditioning projections (timestep -> embedding etc.).
        projections = {}
        for name in cfg.conditioning.signals:
            projections[name] = instantiate_from_config(
                cfg.conditioning.projections[name].to_dict()
            )

        # Context transformer head: an ordered list of context -> context
        # ops (e.g. RunProjection writing timestep_embedding).
        head_cfg = cfg.conditioning.context_transformer_head
        head_list = (
            head_cfg if isinstance(head_cfg, list) else [head_cfg.to_dict()]
        )
        self._context_heads = [instantiate_from_config(h) for h in head_list]
        # Heads that carry their own projection (GCA) register it in the
        # projection dict so its params join the module tree. The dict must
        # be complete BEFORE assignment: linen registers submodules at
        # setattr time.
        for head in self._context_heads:
            if hasattr(head, "make_projection"):
                projections[head.projection_key] = head.make_projection()
        self._projections = projections

        if cfg.is_class_conditional:
            self._label_projection = LabelEmbeddingProjection(
                num_classes=cfg.num_classes,
                embedding_dim=num_features * 4,
            )

        attn_base = instantiate_partial_from_config(
            cfg.conditioning.context_transformer_layer.to_dict()
        )
        attn_ctor = lambda **kw: attn_base(dtype=dt, **kw)

        s = cfg.input_spatial_size
        spatial = [s[0], s[1]] if isinstance(s, list) else [s, s]
        attention_ds = [
            spatial[1] // int(res) for res in cfg.attention.attention_resolutions
        ]

        num_resnet_blocks = cfg.num_resnet_blocks
        if not isinstance(num_resnet_blocks, list):
            num_resnet_blocks = [num_resnet_blocks] * len(channel_multipliers)

        use_ss = bool(cfg.use_scale_shift_norm)
        resamp_conv = bool(cfg.resamp_with_conv)
        updown = bool(cfg.resblock_updown)
        block_type = cfg.resnet_block_type if "resnet_block_type" in cfg else "biggan"

        def res_block(dim_out, **kw):
            if block_type == "biggan":
                return ResnetBlockBigGAN(
                    dim_out=dim_out,
                    use_scale_shift_norm=use_ss,
                    use_conv=resamp_conv,
                    dropout=dropout,
                    dtype=dt,
                    **kw,
                )
            return ResnetBlockDDPM(
                dim_out=dim_out,
                use_scale_shift_norm=use_ss,
                dropout=dropout,
                dtype=dt,
            )

        # Down pyramid. Each entry is a list of (kind, module) stages; skip
        # activations are collected after each entry like the reference.
        downs: List[List[Tuple[str, nn.Module]]] = []
        input_block_chans = [num_features]
        ch = num_features
        ds = 1
        for level, mult in enumerate(channel_multipliers):
            for _ in range(num_resnet_blocks[level]):
                stage = [("res", res_block(mult * num_features))]
                ch = mult * num_features
                if ds in attention_ds:
                    stage.append(("attn", attn_ctor(in_channels=ch)))
                downs.append(stage)
                input_block_chans.append(ch)
            if level != len(channel_multipliers) - 1:
                if updown:
                    downs.append([("res", res_block(ch, down=True))])
                else:
                    downs.append(
                        [("down", Downsample(channels=ch, with_conv=resamp_conv, dtype=dt))]
                    )
                input_block_chans.append(ch)
                ds *= 2

        middle: List[Tuple[str, nn.Module]] = [
            ("res", res_block(ch)),
            ("attn", attn_ctor(in_channels=ch)),
            ("res", res_block(ch)),
        ]

        ups: List[List[Tuple[str, nn.Module]]] = []
        for level, mult in list(enumerate(channel_multipliers))[::-1]:
            for i in range(num_resnet_blocks[level] + 1):
                input_block_chans.pop()
                stage = [("res", res_block(num_features * mult))]
                ch = num_features * mult
                if ds in attention_ds:
                    stage.append(("attn", attn_ctor(in_channels=ch)))
                if level and i == num_resnet_blocks[level]:
                    if updown:
                        stage.append(("res_up", res_block(ch, up=True)))
                    else:
                        stage.append(
                            ("up", Upsample(channels=ch, with_conv=resamp_conv, dtype=dt))
                        )
                    ds //= 2
                ups.append(stage)

        self._downs = downs
        self._middle = middle
        self._ups = ups
        self._initial_conv = nn.Conv(
            channels[0], (3, 3), use_bias=False, dtype=dt, name="initial_conv"
        )
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        self._final_norm = FastGroupNorm(
            num_groups=32 if num_features % 32 == 0 else max(1, num_features // 4),
            silu=True,
            name="final_norm",
        )
        self._final_conv = nn.Conv(
            self._output_channels, (3, 3), use_bias=False, name="final_conv"
        )

    def _apply_stage(self, stage, h, context, deterministic, stage_key=None):
        for idx, (kind, mod) in enumerate(stage):
            if kind in ("res", "res_up"):
                h = mod(h, context=context, deterministic=deterministic)
            elif kind == "attn":
                h = mod(h, context=context, deterministic=deterministic)
            else:  # down / up resample
                h = mod(h)
            h = self._post_element(h, kind, stage_key, idx, context,
                                   deterministic)
        return h

    def _post_element(self, h, kind, stage_key, elem_idx, context,
                      deterministic):
        """Hook: video wrappers interleave temporal modules after each
        element of each stage (reference video_ldm.py:296-333,
        animate_diff.py:385-422 zip spatial/temporal sequentials)."""
        return h

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, H, W, C) noisy batch; returns prediction (and log-variance
        when learned sigma)."""
        context = dict(context)
        for head in self._context_heads:
            if (
                isinstance(head, (RunProjection, nn.Module))
                or hasattr(head, "projection_key")
            ):
                # Heads that consume the shared projection dict (GLIDE
                # transformer, GCA, RunProjection).
                context = head(context, self._projections)
            else:
                context = head(context)
        if self._net_config().is_class_conditional and "classes" in context:
            context["class_embedding"] = self._label_projection(context["classes"])

        h = self._initial_conv(x)
        hs = [h]
        for i, stage in enumerate(self._downs):
            h = self._apply_stage(stage, h, context, deterministic,
                                  ("downs", i))
            hs.append(h)
        h = self._apply_stage(self._middle, h, context, deterministic,
                              ("middle", 0))
        for i, stage in enumerate(self._ups):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._apply_stage(stage, h, context, deterministic,
                                  ("ups", i))

        h = self._final_conv(self._final_norm(h))
        h = h.astype(jnp.float32)

        if self._is_learned_sigma:
            return tuple(jnp.split(h, 2, axis=-1))
        return h
