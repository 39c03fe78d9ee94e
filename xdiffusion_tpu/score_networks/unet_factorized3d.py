"""Factorized space-time UNet from Flexible Diffusion Modeling (FDM).

Faithful counterpart of /root/reference/xdiffusion/score_networks/
unet_factorized3d.py:197-478 ("Flexible Diffusion Modeling of Long
Videos", arXiv:2205.11495) — a DISTINCT architecture from unet_3d:

- frames fold into the batch for a per-frame 2D UNet; the timestep
  embedding is computed PER FRAME (B*T);
- an extra input channel marks observed frames (all ones) vs latent
  frames (all zeros), and observed frames are spliced to their clean
  x0 values at the input (reference :440-452);
- attention is factorized: temporal RPE attention over frames at each
  spatial position — with relative positions computed from EXPLICIT
  frame indices through a timestep-conditioned RPE network — then plain
  spatial attention within each frame (layers.attention.RPEAttention /
  FactorizedAttentionBlock; reference layers/attention.py:910-1090);
- the temporal attention mask keeps observed and latent frames in
  separate attention groups.

This is what lets one model condition on arbitrary observed/latent frame
subsets (FDM masks) and drive the long-video sampling schemes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.attention import FactorizedAttentionBlock
from xdiffusion_tpu.layers.embedding import glide_timestep_embedding
from xdiffusion_tpu.layers.resnet import (
    Downsample,
    ResnetBlockBigGAN,
    Upsample,
)


class Unet(nn.Module):
    """FDM factorized 3D UNet; instantiated with config-struct semantics."""

    config: Any

    def setup(self):
        cfg = self.config
        model_channels = int(cfg.model_channels)
        self._model_channels = model_channels
        self._time_embed_dim = model_channels * 4
        self._is_learned_sigma = bool(cfg.is_learned_sigma)
        in_ch = int(cfg.input_channels)
        self._out_channels = (
            in_ch * 2 if self._is_learned_sigma else int(cfg.output_channels)
        )
        dropout = float(cfg.get("dropout", 0.0))
        channel_mult = list(cfg.channel_mult)
        num_res_blocks = int(cfg.num_res_blocks)
        num_heads = int(cfg.num_heads)
        num_heads_up = int(cfg.get("num_heads_upsample", -1))
        if num_heads_up == -1:
            num_heads_up = num_heads
        use_ss = bool(cfg.use_scale_shift_norm)
        conv_resample = bool(cfg.get("conv_resample", True))
        use_rpe_net = bool(cfg.get("use_rpe_net", True))
        self._use_rpe_net = use_rpe_net

        spatial = int(
            cfg.input_spatial_size
            if not isinstance(cfg.input_spatial_size, list)
            else cfg.input_spatial_size[0]
        )
        attention_ds = [
            spatial // int(res) for res in cfg.attention_resolutions
        ]

        def res_block(dim_out):
            return ResnetBlockBigGAN(
                dim_out=dim_out,
                use_scale_shift_norm=use_ss,
                use_conv=False,
                dropout=dropout,
            )

        def attn_block(ch, heads):
            return FactorizedAttentionBlock(
                channels=ch,
                num_heads=heads,
                time_embed_dim=self._time_embed_dim,
                use_rpe_net=use_rpe_net,
            )

        downs: List[List[Tuple[str, nn.Module]]] = []
        input_block_chans = [model_channels]
        ch = model_channels
        ds = 1
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                stage = [("res", res_block(mult * model_channels))]
                ch = mult * model_channels
                if ds in attention_ds:
                    stage.append(("attn", attn_block(ch, num_heads)))
                downs.append(stage)
                input_block_chans.append(ch)
            if level != len(channel_mult) - 1:
                downs.append(
                    [("down", Downsample(channels=ch, with_conv=conv_resample))]
                )
                input_block_chans.append(ch)
                ds *= 2

        middle: List[Tuple[str, nn.Module]] = [
            ("res", res_block(ch)),
            ("attn", attn_block(ch, num_heads)),
            ("res", res_block(ch)),
        ]

        ups: List[List[Tuple[str, nn.Module]]] = []
        for level, mult in list(enumerate(channel_mult))[::-1]:
            for i in range(num_res_blocks + 1):
                input_block_chans.pop()
                stage = [("res", res_block(model_channels * mult))]
                ch = model_channels * mult
                if ds in attention_ds:
                    stage.append(("attn", attn_block(ch, num_heads_up)))
                if level and i == num_res_blocks:
                    stage.append(
                        ("up", Upsample(channels=ch, with_conv=conv_resample))
                    )
                    ds //= 2
                ups.append(stage)

        self._downs = downs
        self._middle = middle
        self._ups = ups
        self._initial_conv = nn.Conv(
            model_channels, (3, 3), name="initial_conv"
        )
        self._time_fc1 = nn.Dense(self._time_embed_dim, name="time_fc1")
        self._time_fc2 = nn.Dense(self._time_embed_dim, name="time_fc2")
        from xdiffusion_tpu.layers.resnet import FastGroupNorm

        self._final_norm = FastGroupNorm(
            num_groups=32 if model_channels % 32 == 0
            else max(1, model_channels // 4),
            silu=True,
            name="final_norm",
        )
        self._final_conv = nn.Conv(
            self._out_channels,
            (3, 3),
            kernel_init=nn.initializers.zeros,
            name="final_conv",
        )

    def _apply_stage(self, stage, h, emb_bt, temb, frame_indices, attn_mask, t):
        for kind, mod in stage:
            if kind == "res":
                h = mod(h, context={"timestep_embedding": emb_bt})
            elif kind == "attn":
                h = mod(
                    h,
                    temb=temb,
                    frame_indices=frame_indices,
                    attn_mask=attn_mask,
                    frames=t,
                )
            else:  # down / up
                h = mod(h)
        return h

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, F, H, W, C) noisy video. Context: timestep (B,),
        frame_indices (B, F); optional video_mask (B, F) with True/1 =
        generate (latent) and x0 (B, F, H, W, C) clean frames for the
        observed splice."""
        b, t, hh, ww, c = x.shape
        frame_indices = context.get("frame_indices")
        if frame_indices is None:
            frame_indices = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (b, 1))
        frame_indices = frame_indices[:, :t]

        if "video_mask" in context and context["video_mask"] is not None:
            latent_mask = context["video_mask"][:, :t].astype(jnp.float32)
        else:
            latent_mask = jnp.ones((b, t), dtype=jnp.float32)
        # The reference receives DISTINCT observed/latent masks
        # (unet_factorized3d.py:427-437): FDM pad slots whose gathered
        # source frames were selected by neither mask sit in neither group
        # (indicator 0, excluded from temporal attention). Deriving
        # obs=1-latent would misclassify those pad slots as observed.
        if "observed_mask" in context and context["observed_mask"] is not None:
            obs_mask = context["observed_mask"][:, :t].astype(jnp.float32)
        else:
            obs_mask = 1.0 - latent_mask
        attn_mask = jnp.clip(obs_mask + latent_mask, 0.0, 1.0)

        x0 = context.get("x0")
        if x0 is None:
            x0 = jnp.zeros_like(x)
        m = obs_mask[:, :, None, None, None]
        obs_indicator = jnp.broadcast_to(m, (b, t, hh, ww, 1))
        h = jnp.concatenate([x * (1.0 - m) + x0[:, :t] * m, obs_indicator], axis=-1)
        h = h.reshape(b * t, hh, ww, c + 1)

        # Per-frame timestep embedding (reference :436,450): one diffusion
        # time broadcast across frames, embedded at (B*T,) with the
        # GLIDE-style cos-first features (reference layers/utils.py:90).
        timesteps = context["timestep"].astype(jnp.float32)
        t_bt = jnp.broadcast_to(timesteps[:, None], (b, t)).reshape(b * t)
        emb = self._time_fc2(
            nn.silu(
                self._time_fc1(
                    glide_timestep_embedding(t_bt, self._model_channels)
                )
            )
        )
        temb = emb.reshape(b, t, self._time_embed_dim)

        h = self._initial_conv(h)
        hs = [h]
        for stage in self._downs:
            h = self._apply_stage(
                stage, h, emb, temb, frame_indices, attn_mask, t
            )
            hs.append(h)
        h = self._apply_stage(
            self._middle, h, emb, temb, frame_indices, attn_mask, t
        )
        for stage in self._ups:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._apply_stage(
                stage, h, emb, temb, frame_indices, attn_mask, t
            )

        h = self._final_conv(self._final_norm(h))
        h = h.astype(jnp.float32).reshape(b, t, hh, ww, self._out_channels)
        if self._is_learned_sigma:
            return tuple(jnp.split(h, 2, axis=-1))
        return h


# Reference configs use the UNet capitalization.
UNet = Unet
