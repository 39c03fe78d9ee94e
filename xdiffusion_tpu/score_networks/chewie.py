"""Chewie: custom Flux-like MMDiT (reference: score_networks/chewie.py:38,
layers/chewie.py).

The reference's Chewie is a Flux variant — same double/single stream block
grammar and config surface (in_channels = C*p*p, vec/context dims, RoPE
axes) with its own depth split (all double blocks by default). Realized as
the Flux module under Chewie's config; behavioral parity comes from the
shared block implementations.
"""

from __future__ import annotations

from typing import Any

from xdiffusion_tpu.score_networks.flux import Flux as _Flux


class Chewie(_Flux):
    """Marker subclass of the Flux transformer."""
