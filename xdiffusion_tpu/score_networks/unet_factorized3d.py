"""Factorized space-time UNet with frame-index relative positions (FDM).

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/unet_factorized3d.py:197-478 ("Flexible Diffusion
Modeling of Long Videos", arXiv:2205.11495): the factorized video UNet
whose temporal attention biases come from EXPLICIT frame indices in the
context (context["frame_indices"]) rather than window positions — the
mechanism that lets one model condition on arbitrary observed/latent
frame subsets (FDM masks) and drive the long-video sampling schemes.

The mechanism lives in layers.attention.TemporalSelfAttention (it reads
frame_indices when present); this class is the factorized UNet wired for
it.
"""

from __future__ import annotations

from xdiffusion_tpu.score_networks.unet_3d import Unet as _VideoUnet


class Unet(_VideoUnet):
    """Marker subclass: FDM factorized UNet (frame-index RPE temporal
    attention via context["frame_indices"])."""


# Reference configs use the UNet capitalization.
UNet = Unet
