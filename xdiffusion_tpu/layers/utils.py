"""Misc layer utilities (reference: xdiffusion/layers/utils.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class TemporalConv1D(nn.Module):
    """Identity-initialized temporal 1D conv over the frame axis of a
    (B, F, H, W, C) map (the pseudo-conv3d trick, reference
    layers/utils.py:305 TemporalConvolution, dirac-initialized by its
    consumers)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, h, w, c = x.shape

        # Dirac (identity) kernel init + zero bias: starts as a no-op.
        def dirac(key, shape, dtype=jnp.float32):
            k = jnp.zeros(shape, dtype)
            return k.at[shape[0] // 2].set(jnp.eye(c, dtype=dtype))

        seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        out = nn.Conv(
            c,
            (self.kernel_size,),
            padding="SAME",
            kernel_init=dirac,
            name="conv",
        )(seq)
        return out.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)


def TemporalConvolution(kernel_size: int = 3, padding: int = 1, **kwargs):
    """Identity-initialized temporal conv over the frame axis (reference:
    layers/utils.py:305 TemporalConvolution — the pseudo-conv3d building
    block used by the Imagen-Video SSR/TSR configs). Accepts the
    reference's kernel_size/padding knobs; padding is always SAME here
    (static shapes under jit). Factory (not a subclass): linen modules
    are frozen dataclasses."""
    return TemporalConv1D(kernel_size=int(kernel_size))
