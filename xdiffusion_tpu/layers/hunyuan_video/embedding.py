"""HunyuanVideo rotary-embedding context head (reference:
xdiffusion/layers/hunyuan_video/embedding.py)."""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from xdiffusion_tpu.layers.flux import rope_frequencies


class RopeFrequencies:
    """Host-side context head: precompute the (cos, sin) rotary tables for
    the (T', H', W') latent patch grid at context[context_output_key].

    In this framework the score network recomputes RoPE inside the traced
    forward (static shapes under jit make that free), so the tables are
    informational; they are bit-identical to the network's internal ones.
    """

    def __init__(
        self,
        context_output_key: str = "rope_frequencies",
        video_length: int = 29,
        height: int = 64,
        width: int = 64,
        patch_size: Sequence[int] = (1, 2, 2),
        rope_theta: float = 256.0,
        rope_dim_list: Sequence[int] = (16, 24, 24),
        **kwargs,
    ):
        self.context_output_key = context_output_key
        self.grid = [
            max(1, int(video_length) // int(patch_size[0])),
            int(height) // int(patch_size[1]),
            int(width) // int(patch_size[2]),
        ]
        self.theta = float(rope_theta)
        self.axes_dim = list(rope_dim_list)

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if self.context_output_key in context:
            return context
        t, h, w = self.grid
        tt = jnp.arange(t)[:, None, None]
        hh = jnp.arange(h)[None, :, None]
        ww = jnp.arange(w)[None, None, :]
        ids = jnp.stack(
            [
                jnp.broadcast_to(tt, (t, h, w)),
                jnp.broadcast_to(hh, (t, h, w)),
                jnp.broadcast_to(ww, (t, h, w)),
            ],
            axis=-1,
        ).reshape(1, t * h * w, 3)
        cos, sin = rope_frequencies(ids, self.axes_dim, self.theta)
        new_context = dict(context)
        new_context[self.context_output_key] = jnp.stack([cos, sin])
        return new_context
