"""KL-regularized image VAE (LDM AutoencoderKL).

Behavioral counterpart of /root/reference/xdiffusion/autoencoders/
kl.py:9-148: encoder -> double-z moments -> quant conv -> diagonal
gaussian posterior; decoder from post-quant conv. Two-optimizer GAN
training is driven by `training_losses(params, ..., optimizer_idx)`
returning the AE or discriminator objective.

Params tree: {"ae": encoder/decoder/quant convs + loss.logvar,
"disc": discriminator} so the trainer can give each its own optimizer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.autoencoders.base import VariationalAutoEncoder
from xdiffusion_tpu.autoencoders.distributions import DiagonalGaussianDistribution
from xdiffusion_tpu.autoencoders.layers import Decoder, Encoder
from xdiffusion_tpu.config import DotConfig, instantiate_from_config


class _AutoencoderKLModule(nn.Module):
    config: Any  # DotConfig with encoder_decoder_config / embed_dim

    def setup(self):
        edc = self.config.encoder_decoder_config.to_dict()
        assert edc["double_z"]
        self.encoder = Encoder(
            ch=edc["ch"],
            ch_mult=tuple(edc["ch_mult"]),
            num_res_blocks=edc["num_res_blocks"],
            z_channels=edc["z_channels"],
            attn_resolutions=tuple(edc.get("attn_resolutions", []) or []),
            resolution=edc.get("resolution", 32),
            dropout=edc.get("dropout", 0.0),
            double_z=True,
        )
        self.decoder = Decoder(
            ch=edc["ch"],
            ch_mult=tuple(edc["ch_mult"]),
            num_res_blocks=edc["num_res_blocks"],
            z_channels=edc["z_channels"],
            out_ch=edc.get("out_ch", edc.get("in_channels", 3)),
            attn_resolutions=tuple(edc.get("attn_resolutions", []) or []),
            resolution=edc.get("resolution", 32),
            dropout=edc.get("dropout", 0.0),
        )
        embed_dim = int(self.config.embed_dim)
        self.quant_conv = nn.Conv(2 * embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(
            int(self.config.encoder_decoder_config.to_dict()["z_channels"]),
            (1, 1),
            name="post_quant_conv",
        )

    def encode_moments(self, x, deterministic=True):
        h = self.encoder(x, deterministic=deterministic)
        return self.quant_conv(h)

    def decode(self, z, deterministic=True):
        return self.decoder(self.post_quant_conv(z), deterministic=deterministic)

    def __call__(self, x, rng, sample_posterior=True, deterministic=True):
        moments = self.encode_moments(x, deterministic=deterministic)
        posterior = DiagonalGaussianDistribution(moments)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        dec = self.decode(z, deterministic=deterministic)
        return dec, moments


class AutoencoderKL(VariationalAutoEncoder):
    """Config-driven wrapper; reference contract
    (`instantiate_with_config_struct`: the params block arrives whole)."""

    def __init__(self, config: DotConfig, **kwargs):
        self._config = config
        self.module = _AutoencoderKLModule(config=config)
        # torch.nn.Identity is the reference's "no loss" convention for
        # frozen/inference VAEs (e.g. its parity/latent-encoder configs) —
        # skip building a loss module entirely.
        self.loss_module = (
            instantiate_from_config(config.loss_config.to_dict())
            if "loss_config" in config
            and not config.loss_config.target.endswith("Identity")
            else None
        )

    # -- params -----------------------------------------------------------

    def init_params(self, rng: jax.Array, batch_size: int = 1) -> Dict:
        edc = self._config.encoder_decoder_config.to_dict()
        res = edc.get("resolution", 32)
        # Square int or [H, W] (the audio VAE trains on 64x128 log-mels).
        res_h, res_w = (
            (int(res[0]), int(res[1]))
            if isinstance(res, (list, tuple))
            else (int(res), int(res))
        )
        x = jnp.zeros((batch_size, res_h, res_w, edc.get("in_channels", 3)))
        rng_p, rng_s, rng_l = jax.random.split(rng, 3)
        ae = jax.jit(self.module.init, static_argnums=())(rng_p, x, rng_s)
        params = {"ae": ae}
        if self.loss_module is not None:
            recon = x
            down = 2 ** (len(edc["ch_mult"]) - 1)
            moments = jnp.zeros(
                (batch_size, res_h // down, res_w // down,
                 2 * int(self._config.embed_dim)),
            )
            posterior = DiagonalGaussianDistribution(moments)
            params["disc"] = jax.jit(
                lambda key: self.loss_module.init(
                    key, x, recon, posterior, 0, jnp.zeros((), jnp.int32)
                )
            )(rng_l)
        return params

    # -- protocol -----------------------------------------------------------

    def encode_to_latents(self, params, x: jax.Array, rng: jax.Array) -> jax.Array:
        moments = self.module.apply(
            params["ae"] if "ae" in params else params,
            x,
            method=_AutoencoderKLModule.encode_moments,
        )
        posterior = DiagonalGaussianDistribution(moments)
        return jax.lax.stop_gradient(posterior.sample(rng))

    def decode_from_latents(self, params, z: jax.Array, **kwargs) -> jax.Array:
        return self.module.apply(
            params["ae"] if "ae" in params else params,
            z,
            method=_AutoencoderKLModule.decode,
        )

    # -- training -----------------------------------------------------------

    def training_losses(
        self,
        params: Dict,
        rng: jax.Array,
        inputs: jax.Array,
        optimizer_idx: int,
        global_step: jax.Array,
        deterministic: bool = False,
    ) -> Tuple[jax.Array, Dict]:
        rng_s, rng_d = jax.random.split(rng)

        def forward(ae_params):
            recon, moments = self.module.apply(
                ae_params,
                inputs,
                rng_s,
                deterministic=deterministic,
                rngs={"dropout": rng_d} if not deterministic else None,
            )
            return recon, DiagonalGaussianDistribution(moments)

        recon, posterior = forward(params["ae"])
        from xdiffusion_tpu.autoencoders.losses import maybe_adaptive_weight

        adaptive = maybe_adaptive_weight(
            self.loss_module, params, forward, inputs, global_step,
            optimizer_idx, "decoder/conv_out",
        )
        loss, logs = self.loss_module.apply(
            params["disc"], inputs, recon, posterior, optimizer_idx,
            global_step, adaptive_weight=adaptive,
        )
        return loss, logs
