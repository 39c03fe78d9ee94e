"""LTX-Video causal VAE (registry module for the reference dotted path
xdiffusion.autoencoders.ltx_vae.CausalVideoAutoencoder). Implementation
shared with the Hunyuan VAE in autoencoders/causal_video.py."""

from xdiffusion_tpu.autoencoders.causal_video import (  # noqa: F401
    CausalVideoAutoencoder,
)
