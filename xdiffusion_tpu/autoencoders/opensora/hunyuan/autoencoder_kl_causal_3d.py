"""OpenSora's Hunyuan-style causal 3D KL VAE (reference:
xdiffusion/autoencoders/opensora/hunyuan/autoencoder_kl_causal_3d.py).

Same architecture family as autoencoders/hunyuan.py (causal convs,
Down/Up blocks, frame-causal mid attention) with double-z (per-channel
logvar), config-driven latent scale/shift factors (encode: z = scale *
(z - shift), reference :167; decode inverts, :209) and tiling flags
honored from the YAML.
"""

from __future__ import annotations

from typing import Any

import jax

from xdiffusion_tpu.autoencoders.hunyuan import HunyuanCausal3DVAE


class AutoencoderKLCausal3D(HunyuanCausal3DVAE):
    def __init__(self, config: Any = None, **kwargs):
        if config is None:
            from xdiffusion_tpu.config import DotConfig

            config = DotConfig(dict(kwargs))
        # double_z per-channel moments (reference encoder double_z=True).
        if "latent_logvar" not in config:
            config._cfg["latent_logvar"] = "per_channel"
        super().__init__(config)
        self.scale_factor = float(config.get("scale_factor", 0.476986))
        self.shift_factor = float(config.get("shift_factor", 0.0))
        self.use_spatial_tiling = bool(config.get("use_spatial_tiling", False))
        self.use_temporal_tiling = bool(
            config.get("use_temporal_tiling", False)
        )
        self.tile_overlap_factor = float(
            config.get("tile_overlap_factor", 0.25)
        )

    def encode_to_latents(self, params, x, rng):
        z = super().encode_to_latents(params, x, rng)
        return self.scale_factor * (z - self.shift_factor)

    def decode_from_latents(self, params, z, **kwargs):
        z = z / self.scale_factor + self.shift_factor
        return super().decode_from_latents(params, z, **kwargs)
