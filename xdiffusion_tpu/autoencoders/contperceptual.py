"""Perceptual VAE losses (reference:
xdiffusion/autoencoders/contperceptual.py). The implementation lives in
autoencoders/losses.py; this module keeps the reference target paths
resolvable (including the reference's LPAPS spelling)."""

from xdiffusion_tpu.autoencoders.losses import LPIPSWithDiscriminator

# Reference configs spell this both ways.
LPAPSWithDiscriminator = LPIPSWithDiscriminator

__all__ = ["LPIPSWithDiscriminator", "LPAPSWithDiscriminator"]
