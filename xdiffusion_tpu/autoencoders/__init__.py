"""Autoencoders (latent spaces for latent diffusion).

Counterpart of /root/reference/xdiffusion/autoencoders/: the
`VariationalAutoEncoder` protocol (encode_to_latents / decode_from_latents),
the LDM-style KL image VAE, and the GAN+perceptual training losses.
"""

from xdiffusion_tpu.autoencoders.base import VariationalAutoEncoder  # noqa: F401
