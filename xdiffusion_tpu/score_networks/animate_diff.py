"""AnimateDiff: motion modules on a base image UNet.

Faithful counterpart of /root/reference/xdiffusion/score_networks/
animate_diff.py:22-431 ("AnimateDiff", arXiv:2307.04725): the 2D image
UNet (built from `config.spatial_score_network`) runs per-frame with
frames folded into the batch; zero-initialized temporal transformer
"motion modules" are interleaved after every resnet/attention element —
after the attention when a stage has one, after the resnet otherwise,
never after a resample. Each motion module is a TemporalTransformer
(GroupNorm -> proj_in -> N blocks of [LayerNorm -> alpha-gated temporal
self-attention] + GEGLU feed-forward -> zero proj_out -> residual), so
the net starts exactly at the image model and only motion modules learn
video dynamics (image->video weight transfer; the reference freezes the
spatial tree in its constructor, animate_diff.py:348-353 — here freezing
is the optimizer's job via `--train_temporal_modules_only`).
"""

from __future__ import annotations

from typing import Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import (
    RunProjection,
    interleaved_frame_position_encoding,
)
from xdiffusion_tpu.layers.resnet import FastGroupNorm
from xdiffusion_tpu.ops import dot_product_attention
from xdiffusion_tpu.score_networks.unet import Unet as _ImageUnet
from xdiffusion_tpu.score_networks.unet_3d import (
    _fold,
    _tile_context_over_frames,
    _unfold,
)


class MotionSelfAttention(nn.Module):
    """Alpha-gated temporal self-attention (reference
    animate_diff.py:46-92 TemporalSelfAttention): frame-position codes
    added to the (normed) input, bias-free q/k/v/o projections,
    attention over the frame axis per spatial position, output mixed as
    alpha*skip + (1-alpha)*out with alpha clamped to [0, 1] (init 1 —
    identity; the torch clamp_ is an in-place param clamp per forward,
    realized here functionally)."""

    num_frames: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, HW, T, C) — the LayerNormed block input.
        b, hw, t, c = x.shape
        skip = x
        x = x + interleaved_frame_position_encoding(self.num_frames, c)
        head_dim = c // self.heads
        proj_dim = head_dim * self.heads
        q = nn.Dense(proj_dim, use_bias=False, name="q_proj")(x)
        k = nn.Dense(proj_dim, use_bias=False, name="k_proj")(x)
        v = nn.Dense(proj_dim, use_bias=False, name="v_proj")(x)
        q, k, v = (
            a.reshape(b * hw, t, self.heads, head_dim).transpose(0, 2, 1, 3)
            for a in (q, k, v)
        )
        out = dot_product_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, hw, t, proj_dim)
        out = nn.Dense(c, use_bias=False, name="o_proj")(out)
        alpha = jnp.clip(self.param("alpha", nn.initializers.ones, (1,)),
                         0.0, 1.0)
        return alpha * skip + (1.0 - alpha) * out


class TemporalTransformerBlock(nn.Module):
    """N alpha-gated attention sub-blocks + a GEGLU feed-forward
    (reference animate_diff.py:95-139)."""

    num_frames: int
    heads: int
    num_attention_blocks: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        for a in range(self.num_attention_blocks):
            norm_x = nn.LayerNorm(name=f"norm_{a}")(x)
            x = MotionSelfAttention(
                num_frames=self.num_frames, heads=self.heads,
                name=f"attn_{a}",
            )(norm_x) + x
        # FeedForward(dim, glu=True) (reference layers/transformer.py:
        # 52-78): GEGLU projection -> dropout -> linear.
        h = nn.LayerNorm(name="ff_norm")(x)
        dim = x.shape[-1]
        h = nn.Dense(2 * 4 * dim, name="ff_in")(h)
        val, gate = jnp.split(h, 2, axis=-1)
        h = val * jax.nn.gelu(gate, approximate=False)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(dim, name="ff_out")(h)
        return h + x


class TemporalTransformer(nn.Module):
    """One motion module (reference animate_diff.py:142-198): GroupNorm
    over channels with stats across all frames/positions of an example,
    proj_in to the attention width, transformer blocks over the frame
    axis, zero-init proj_out, residual."""

    in_channels: int
    num_frames: int
    heads: int
    head_dim: int
    blocks_per_layer: int
    num_layers: int = 1
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # x: frame-folded (B*F, H, W, C).
        bf, hh, ww, c = x.shape
        f = self.num_frames
        b = bf // f
        residual = x
        groups = (
            self.norm_groups if c % self.norm_groups == 0
            else max(1, c // 4)
        )
        h = FastGroupNorm(
            num_groups=groups, epsilon=1e-6, stat_frames=f, name="norm"
        )(x)
        # (B*F, H, W, C) -> (B, HW, T, C) (reference rearranges
        # "(b t) c h w -> b (h w) t c").
        h = h.reshape(b, f, hh * ww, c).transpose(0, 2, 1, 3)
        inner = self.heads * self.head_dim
        h = nn.Dense(inner, name="proj_in")(h)
        for layer in range(self.num_layers):
            h = TemporalTransformerBlock(
                num_frames=f,
                heads=self.heads,
                num_attention_blocks=self.blocks_per_layer,
                name=f"block_{layer}",
            )(h, deterministic=deterministic)
        h = nn.Dense(
            c, kernel_init=nn.initializers.zeros, name="proj_out"
        )(h)
        h = h.transpose(0, 2, 1, 3).reshape(bf, hh, ww, c)
        return h + residual


def _res_stage_plan(stage) -> int:
    """Element index after which the temporal module runs: after the
    attention when present, else after the (first) resnet (reference
    interleave: temporal = [Identity, TT] with attention, [TT] without).
    Returns -1 for resample-only stages (they get identities)."""
    kinds = [kind for kind, _ in stage]
    if "attn" in kinds:
        return kinds.index("attn")
    if kinds == ["res"]:
        mod = stage[0][1]
        if getattr(mod, "up", False) or getattr(mod, "down", False):
            return -1
        return 0
    if kinds and kinds[0] == "res":
        return 0
    return -1


class Unet(_ImageUnet):
    """Image UNet + interleaved motion modules (reference
    AnimateDiffUnet, animate_diff.py:201-431)."""

    @nn.nowrap
    def _net_config(self):
        return self.config.spatial_score_network

    def setup(self):
        super().setup()
        cfg = self.config
        mm = cfg.motion_module
        self._num_frames = int(cfg.input_number_of_frames)

        def make(ch: int, name: str) -> TemporalTransformer:
            return TemporalTransformer(
                in_channels=ch,
                num_frames=self._num_frames,
                heads=int(mm.num_attention_heads),
                head_dim=int(mm.attention_head_dims),
                blocks_per_layer=int(mm.num_attention_blocks_per_layer),
                num_layers=int(mm.get("num_layers", 1)),
                name=name,
            )

        def stage_channels(stage) -> int:
            mod = stage[0][1]
            return int(getattr(mod, "dim_out", 0))

        motion_place: Dict[Tuple[str, int], int] = {}
        motion: Dict[str, TemporalTransformer] = {}
        for i, stage in enumerate(self._downs):
            place = _res_stage_plan(stage)
            if place >= 0:
                motion_place[("downs", i)] = place
                motion[f"downs_{i}"] = make(
                    stage_channels(stage), f"motion_down_{i}"
                )
        # Middle: TT after the attention, between the two res blocks
        # (reference motion_modules_middle = [Identity, TT, Identity]).
        kinds = [kind for kind, _ in self._middle]
        motion_place[("middle", 0)] = kinds.index("attn")
        motion["middle_0"] = make(
            stage_channels(self._middle), "motion_middle"
        )
        for i, stage in enumerate(self._ups):
            place = _res_stage_plan(stage)
            if place >= 0:
                motion_place[("ups", i)] = place
                motion[f"ups_{i}"] = make(
                    stage_channels(stage), f"motion_up_{i}"
                )
        self._motion_place = motion_place
        self._motion = motion

    def _post_element(self, h, kind, stage_key, elem_idx, context,
                      deterministic):
        if stage_key is None:
            return h
        place = self._motion_place.get(stage_key)
        if place is None or place != elem_idx:
            return h
        mod = self._motion[f"{stage_key[0]}_{stage_key[1]}"]
        return mod(h, deterministic=deterministic)

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (B, F, H, W, C) video batch (reference forward reshapes
        "b c f h w -> (b f) c h w", animate_diff.py:376-378)."""
        context = dict(context)
        for head in self._context_heads:
            if (
                isinstance(head, (RunProjection, nn.Module))
                or hasattr(head, "projection_key")
            ):
                context = head(context, self._projections)
            else:
                context = head(context)
        if self._net_config().is_class_conditional and "classes" in context:
            context["class_embedding"] = self._label_projection(
                context["classes"]
            )

        h, f = _fold(x)
        # Per-example conditioning repeats per frame once frames fold
        # into the batch (the reference does this via its
        # SpatialBatchForVideo context heads; ours are pass-throughs and
        # the fold site tiles, matching unet_3d).
        context = _tile_context_over_frames(context, f)
        h = self._initial_conv(h)
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
        h = _unfold(h.astype(jnp.float32), f)
        if self._is_learned_sigma:
            return tuple(jnp.split(h, 2, axis=-1))
        return h


# Reference configs name the class AnimateDiffUnet.
AnimateDiffUnet = Unet
