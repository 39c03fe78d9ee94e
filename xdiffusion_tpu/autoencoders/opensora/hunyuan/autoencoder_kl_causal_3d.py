"""OpenSora's Hunyuan-style causal 3D KL VAE (reference:
xdiffusion/autoencoders/opensora/hunyuan/autoencoder_kl_causal_3d.py).

Maps onto the shared causal-video VAE implementation
(autoencoders/causal_video.py) — same causal time convolutions and
compression plan; the reference's tiling/slicing inference knobs are
accepted and ignored (XLA handles the memory tiling under jit).
"""

from __future__ import annotations

from typing import Any

from xdiffusion_tpu.autoencoders.hunyuan import HunyuanCausal3DVAE


def AutoencoderKLCausal3D(config: Any = None, **kwargs):
    if config is not None and not kwargs:
        return HunyuanCausal3DVAE(config)
    return HunyuanCausal3DVAE(config, **kwargs)
