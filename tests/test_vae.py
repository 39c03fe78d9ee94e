"""VAE tests: posterior math, encode/decode shapes, GAN train step,
latent-diffusion wiring."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xdiffusion_tpu.autoencoders.distributions import DiagonalGaussianDistribution
from xdiffusion_tpu.autoencoders.kl import AutoencoderKL
from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
from xdiffusion_tpu.training.image.autoencoder import (
    VAETrainState,
    make_vae_train_step,
)

from test_diffusion import tiny_config


def tiny_vae_config():
    return DotConfig(
        {
            "encoder_decoder_config": {
                "double_z": True,
                "z_channels": 4,
                "resolution": 16,
                "in_channels": 1,
                "out_ch": 1,
                "ch": 16,
                "ch_mult": [1, 2],
                "num_res_blocks": 1,
                "attn_resolutions": [],
                "dropout": 0.0,
            },
            "embed_dim": 4,
            "loss_config": {
                "target": "xdiffusion.autoencoders.losses.LPIPSWithDiscriminator",
                "params": {
                    "disc_start": 0,
                    "kl_weight": 1.0e-6,
                    "disc_weight": 0.5,
                    "disc_in_channels": 1,
                    "disc_num_layers": 2,
                },
            },
        }
    )


def test_diagonal_gaussian():
    params = jnp.concatenate(
        [jnp.zeros((2, 4, 4, 2)), jnp.zeros((2, 4, 4, 2))], axis=-1
    )
    dist = DiagonalGaussianDistribution(params)
    # Standard normal posterior: KL to prior == 0.
    np.testing.assert_allclose(np.asarray(dist.kl()), np.zeros(2), atol=1e-6)
    s = dist.sample(jax.random.PRNGKey(0))
    assert s.shape == (2, 4, 4, 2)
    assert float(jnp.abs(dist.mode()).max()) == 0.0


def test_vae_encode_decode_roundtrip_shapes():
    vae = AutoencoderKL(tiny_vae_config())
    params = vae.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1))
    z = vae.encode_to_latents(params, x, jax.random.PRNGKey(2))
    assert z.shape == (2, 8, 8, 4)  # one downsample, embed_dim latents
    recon = vae.decode_from_latents(params, z)
    assert recon.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(recon)))


def test_vae_gan_train_step_improves_reconstruction():
    vae = AutoencoderKL(tiny_vae_config())
    params = vae.init_params(jax.random.PRNGKey(0))
    tx_ae = optax.adam(1e-3)
    tx_disc = optax.adam(1e-3)
    state = VAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_ae=tx_ae.init(params["ae"]),
        opt_disc=tx_disc.init(params["disc"]),
    )
    step_fn = make_vae_train_step(vae, tx_ae, tx_disc)
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1))
    }
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss_ae"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # AE objective falls on a fixed batch
    assert int(state.step) == 8


def test_latent_diffusion_wiring():
    # Diffusion over the tiny VAE's 8x8x4 latent space.
    vae_cfg = tiny_vae_config().to_dict()
    cfg = copy.deepcopy(tiny_config().to_dict())
    sn = cfg["diffusion"]["score_network"]["params"]
    sn["input_channels"] = 4
    sn["output_channels"] = 4
    cfg["diffusion"]["sampling"]["output_channels"] = 4
    cfg["diffusion"]["sampling"]["output_spatial_size"] = 8
    cfg["diffusion"]["latent_encoder"] = {
        "target": "xdiffusion.autoencoders.kl.AutoencoderKL",
        "params": vae_cfg,
    }
    model = GaussianDiffusion_DDPM(DotConfig(cfg))
    assert model.latent_encoder() is not None

    vae_params = model.latent_encoder().init_params(jax.random.PRNGKey(0))
    model.set_latent_encoder_params(vae_params)
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))
    scale = model.compute_latent_scale(images, jax.random.PRNGKey(2))
    assert np.isfinite(scale) and scale > 0

    params = model.init_params(jax.random.PRNGKey(3))
    loss, _ = jax.jit(lambda p, r: model.loss_on_batch(p, r, images, {}))(
        params, jax.random.PRNGKey(4)
    )
    assert np.isfinite(float(loss))

    # Sampling decodes from latents back to pixel space.
    samples = model.sample(
        params, jax.random.PRNGKey(5), num_samples=2, num_sampling_steps=4
    )
    assert samples.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(samples)))
