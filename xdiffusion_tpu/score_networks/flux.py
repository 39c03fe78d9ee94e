"""Flux: rectified-flow transformer with double + single stream blocks.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/flux.py:41-191: patchified image tokens and T5 text tokens
flow through `depth` double-stream blocks, merge, then `depth_single_blocks`
single-stream blocks; conditioning vec = time embedding + CLIP pooled
embedding (+ optional guidance embedding for distilled models); 3-axis
RoPE over (batch, row, col) ids.

Text conditioning arrives host-side as context["t5_text_embeddings"]
(B, L, context_in_dim) and context["clip_text_embeddings"] (B, vec_in_dim)
via the CLIP/T5 embedder preprocessors (offline hash fallbacks).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import glide_timestep_embedding
from xdiffusion_tpu.layers.flux import (
    DoubleStreamBlock,
    LastLayer,
    MLPEmbedder,
    SingleStreamBlock,
    rope_frequencies,
)


class Flux(nn.Module):
    config: Any
    norm_cls: str = "layernorm"

    def setup(self):
        cfg = self.config
        self._patch_size = int(cfg.patch_size)
        d = int(cfg.hidden_size)
        self._hidden = d
        self._num_heads = int(cfg.num_heads)
        pe_dim = d // self._num_heads
        self._axes_dim = tuple(cfg.axes_dim)
        assert sum(self._axes_dim) == pe_dim, (
            f"axes_dim {self._axes_dim} must sum to head dim {pe_dim}"
        )
        self._theta = float(cfg.get("theta", 10000))
        self._guidance_embed = bool(cfg.get("guidance_embed", False))
        self._in_channels = int(cfg.in_channels)

        self._img_in = nn.Dense(d, name="img_in")
        self._time_in = MLPEmbedder(hidden_dim=d, name="time_in")
        self._vector_in = MLPEmbedder(hidden_dim=d, name="vector_in")
        if self._guidance_embed:
            self._guidance_in = MLPEmbedder(hidden_dim=d, name="guidance_in")
        self._txt_in = nn.Dense(d, name="txt_in")

        self._double_blocks = [
            DoubleStreamBlock(
                hidden_size=d,
                num_heads=self._num_heads,
                mlp_ratio=float(cfg.mlp_ratio),
                qkv_bias=bool(cfg.get("qkv_bias", True)),
                norm_cls=self.norm_cls,
                name=f"double_{i}",
            )
            for i in range(int(cfg.depth))
        ]
        self._single_blocks = [
            SingleStreamBlock(
                hidden_size=d,
                num_heads=self._num_heads,
                mlp_ratio=float(cfg.mlp_ratio),
                norm_cls=self.norm_cls,
                name=f"single_{i}",
            )
            for i in range(int(cfg.depth_single_blocks))
        ]
        self._final = LastLayer(
            hidden_size=d,
            out_dim=self._in_channels,
            norm_cls=self.norm_cls,
            name="final",
        )

    @nn.nowrap
    def _stack_fits(self, pipe, depth: int) -> bool:
        mesh, axis, _ = pipe
        s = mesh.shape[axis]
        return depth >= s and depth % s == 0

    @nn.nowrap
    def _pipelined_stack(self, which: str, x, cond, pipe, deterministic):
        """GPipe path (parallel/pipeline.py) for the double- or
        single-stream block stack; conditioning (vec, rope cos/sin) is
        read by every stage, the (img, txt) tuple / merged tokens
        circulate."""
        from xdiffusion_tpu.parallel.pipeline import run_pipelined_stack

        if which == "double":
            blocks = self._double_blocks
            tmpl = blocks[0].clone(parent=None)

            def tmpl_apply(p, a, cc, r):
                im, tx = a
                vec, cos, sin = cc
                return tuple(
                    tmpl.apply(
                        {"params": p}, im, tx, vec, cos, sin,
                        deterministic=deterministic,
                    )
                )

            names = [f"double_{i}" for i in range(len(blocks))]
        else:
            blocks = self._single_blocks
            tmpl = blocks[0].clone(parent=None)

            def tmpl_apply(p, a, cc, r):
                vec, cos, sin = cc
                return tmpl.apply(
                    {"params": p}, a, vec, cos, sin,
                    deterministic=deterministic,
                )

            names = [f"single_{i}" for i in range(len(blocks))]
        params_list = [self.variables["params"][n] for n in names]
        return run_pipelined_stack(tmpl_apply, params_list, x, cond, pipe)

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> jax.Array:
        b, h, w, c = x.shape
        p = self._patch_size
        gh, gw = h // p, w // p

        # Patchify: (B, gh*gw, C*p*p).
        img = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 5, 2, 4)
        img = img.reshape(b, gh * gw, c * p * p)

        # 3-axis position ids: (batch-axis 0, row, col); text ids all zero.
        rows = jnp.repeat(jnp.arange(gh), gw)
        cols = jnp.tile(jnp.arange(gw), gh)
        img_ids = jnp.stack(
            [jnp.zeros_like(rows), rows, cols], axis=-1
        ).astype(jnp.float32)
        img_ids = jnp.broadcast_to(img_ids[None], (b, gh * gw, 3))

        txt = context["t5_text_embeddings"]
        y = context["clip_text_embeddings"]
        txt_ids = jnp.zeros((b, txt.shape[1], 3), dtype=jnp.float32)

        timesteps = context["timestep"].astype(jnp.float32)
        img = self._img_in(img)
        # Flux timestep features: cos-first glide sinusoid of 1000*t
        # (reference layers/flux.py:60-84, time_factor=1000).
        vec = self._time_in(
            glide_timestep_embedding(timesteps, 256, scale=1000.0)
        )
        if self._guidance_embed:
            guidance = context["distillation_guidance"].astype(jnp.float32)
            vec = vec + self._guidance_in(
                glide_timestep_embedding(guidance, 256, scale=1000.0)
            )
        vec = vec + self._vector_in(y)
        txt = self._txt_in(txt)

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        cos, sin = rope_frequencies(ids, self._axes_dim, self._theta)

        pipe = None
        if not self.is_initializing():
            from xdiffusion_tpu.parallel.pipeline import get_pipeline_context

            pipe = get_pipeline_context()

        if pipe is not None and self._stack_fits(pipe, len(self._double_blocks)):
            # GPipe path (parallel/pipeline.py): the (img, txt) dual
            # stream circulates as a tuple through the staged blocks.
            img, txt = self._pipelined_stack(
                "double", (img, txt), (vec, cos, sin), pipe, deterministic
            )
        else:
            for block in self._double_blocks:
                img, txt = block(
                    img, txt, vec, cos, sin, deterministic=deterministic
                )

        merged = jnp.concatenate([txt, img], axis=1)
        if pipe is not None and self._stack_fits(pipe, len(self._single_blocks)):
            merged = self._pipelined_stack(
                "single", merged, (vec, cos, sin), pipe, deterministic
            )
        else:
            for block in self._single_blocks:
                merged = block(
                    merged, vec, cos, sin, deterministic=deterministic
                )
        img = merged[:, txt.shape[1] :]

        img = self._final(img, vec)  # (B, N, C*p*p)
        out = img.reshape(b, gh, gw, c, p, p).transpose(0, 1, 4, 2, 5, 3)
        return out.reshape(b, h, w, c).astype(jnp.float32)
