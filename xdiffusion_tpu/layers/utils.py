"""Misc layer utilities (reference: xdiffusion/layers/utils.py)."""

from __future__ import annotations

from xdiffusion_tpu.score_networks.unet_pseudo3d import TemporalConv1D


def TemporalConvolution(kernel_size: int = 3, padding: int = 1, **kwargs):
    """Identity-initialized temporal conv over the frame axis (reference:
    layers/utils.py TemporalConvolution — the pseudo-conv3d building
    block). Accepts the reference's kernel_size/padding knobs; padding is
    always SAME here (static shapes under jit). Factory (not a subclass):
    linen modules are frozen dataclasses."""
    return TemporalConv1D(kernel_size=int(kernel_size))
