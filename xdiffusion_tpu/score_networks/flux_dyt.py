"""Flux with DynamicTanh (DyT) normalization.

Counterpart of /root/reference/xdiffusion/score_networks/flux_dyt.py:41
("Transformers without Normalization"): identical architecture to Flux
with every LayerNorm replaced by DyT. Realized here as the same module
with norm_cls="dyt" instead of a cloned file."""

from __future__ import annotations

from typing import Any

from xdiffusion_tpu.score_networks.flux import Flux as _Flux


def Flux(config: Any, **kwargs) -> _Flux:
    return _Flux(config=config, norm_cls="dyt", **kwargs)
