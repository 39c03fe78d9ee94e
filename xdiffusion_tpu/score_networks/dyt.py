"""PixArt-alpha with DynamicTanh (DyT) normalization.

Counterpart of /root/reference/xdiffusion/score_networks/dyt.py:126:
PixArt-alpha with every LayerNorm replaced by DyT (tanh(alpha*x) with
an elementwise affine — "Transformers without Normalization"). The
adaLN-single modulation path is unchanged; only the normalization
sites swap, via PixArtAlpha's norm_cls knob."""

from __future__ import annotations

from typing import Any

from xdiffusion_tpu.score_networks.pixart import PixArtAlpha as _PixArtAlpha


class PixArtAlphaDyT(_PixArtAlpha):
    """PixArt-alpha with DyT norms by default."""

    _default_norm_cls = "dyt"


# Name used by the reference configs
# (configs/image/mnist/pixart_alpha_dyt.yaml).
DyTScoreNetwork = PixArtAlphaDyT


def PixArtAlpha(config: Any, **kwargs) -> _PixArtAlpha:
    return PixArtAlphaDyT(config=config, **kwargs)
