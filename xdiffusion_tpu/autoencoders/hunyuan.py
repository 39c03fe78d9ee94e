"""HunyuanVideo causal-3D VAE (registry module for the reference dotted
path xdiffusion.autoencoders.hunyuan.HunyuanCausal3DVAE). Implementation
shared with the LTX VAE in autoencoders/causal_video.py."""

from xdiffusion_tpu.autoencoders.causal_video import (  # noqa: F401
    HunyuanCausal3DVAE,
)
