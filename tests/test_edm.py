"""EDM family tests: preconditioners, backbones, losses, Heun samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.diffusion.edm import (
    EDMLoss,
    GaussianDiffusion_EDM,
    VELoss,
    VPLoss,
)
from xdiffusion_tpu.samplers.edm import (
    GeneralizedStochasticSampler,
    StochasticSampler,
)
from xdiffusion_tpu.score_networks.edm import (
    EDMPrecond,
    VEPrecond,
    VPPrecond,
    iDDPMPrecond,
)


def tiny_song_unet(embedding_type="positional", encoder_type="standard",
                   resample_filter=(1, 1)):
    return {
        "target": "xdiffusion.score_networks.edm.SongUNet",
        "params": {
            "img_resolution": 16,
            "in_channels": 1,
            "out_channels": 1,
            "label_dim": 0,
            "augment_dim": 0,
            "model_channels": 16,
            "channel_mult": [1, 2],
            "channel_mult_emb": 2,
            "num_blocks": 1,
            "attn_resolutions": [8],
            "dropout": 0.0,
            "embedding_type": embedding_type,
            "channel_mult_noise": 1,
            "encoder_type": encoder_type,
            "decoder_type": "standard",
            "resample_filter": list(resample_filter),
        },
    }


def tiny_edm_config(sampler="stochastic", **sampler_params):
    if sampler == "stochastic":
        sampling = {
            "output_channels": 1,
            "output_spatial_size": 16,
            "target": "xdiffusion.samplers.edm.StochasticSampler",
            "params": {"num_steps": 4, "S_churn": 10.0, **sampler_params},
        }
    else:
        sampling = {
            "output_channels": 1,
            "output_spatial_size": 16,
            "target": "xdiffusion.samplers.edm.GeneralizedStochasticSampler",
            "params": {"num_steps": 4, **sampler_params},
        }
    return DotConfig(
        {
            "target": "xdiffusion.diffusion.edm.GaussianDiffusion_EDM",
            "diffusion": {
                "sampling": sampling,
                "loss": {
                    "target": "xdiffusion.diffusion.edm.EDMLoss",
                    "params": {},
                },
                "score_network": {
                    "target": "xdiffusion.score_networks.edm.EDMPrecond",
                    "params": {
                        "img_resolution": 16,
                        "img_channels": 1,
                        "label_dim": 0,
                        "sigma_min": 0,
                        "sigma_max": float("inf"),
                        "sigma_data": 0.5,
                        "model": tiny_song_unet(),
                    },
                },
            },
            "data": {"image_size": 16, "num_channels": 1, "num_classes": 10},
        }
    )


def test_edm_precond_coefficients_identities():
    net = EDMPrecond(sigma_data=0.5, model=tiny_song_unet())
    sigma = jnp.array([0.1, 1.0, 10.0])
    c_skip, c_out, c_in, c_noise = net.coefficients(sigma)
    # Boundary-condition identities from EDM Table 1.
    sd = 0.5
    np.testing.assert_allclose(
        np.asarray(c_skip), sd**2 / (sigma**2 + sd**2), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(c_out**2 + c_skip**2 * (sigma**2 + sd**2) - sd**2),
        np.zeros(3),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(c_noise), 0.25 * np.log(sigma), rtol=1e-6)


def test_vp_precond_sigma_roundtrip():
    net = VPPrecond(model=tiny_song_unet())
    t = jnp.array([0.1, 0.5, 1.0])
    np.testing.assert_allclose(
        np.asarray(net.sigma_inv(net.sigma(t))), np.asarray(t), rtol=1e-4
    )
    assert net.sigma_min > 0 and net.sigma_max > net.sigma_min


def test_iddpm_round_sigma_snaps_to_table():
    net = iDDPMPrecond(model=tiny_song_unet())
    rounded = net.round_sigma(jnp.array([1.0, 10.0]))
    u = np.asarray(net.u)
    for r in np.asarray(rounded):
        assert np.min(np.abs(u - r)) < 1e-6


def test_song_unet_variants_forward():
    for emb, enc, filt in [
        ("positional", "standard", (1, 1)),
        ("fourier", "residual", (1, 3, 3, 1)),
    ]:
        net = EDMPrecond(
            sigma_data=0.5, model=tiny_song_unet(emb, enc, filt)
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
        sigma = jnp.array([1.0, 2.0])
        params = net.init(jax.random.PRNGKey(1), x, sigma)
        out = jax.jit(lambda p, x, s: net.apply(p, x, s))(params, x, sigma)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))


def test_dhariwal_unet_forward():
    model_cfg = {
        "target": "xdiffusion.score_networks.edm.DhariwalUNet",
        "params": {
            "img_resolution": 16,
            "in_channels": 1,
            "out_channels": 1,
            "label_dim": 10,
            "model_channels": 16,
            "channel_mult": [1, 2],
            "num_blocks": 1,
            "attn_resolutions": [8],
            "dropout": 0.0,
        },
    }
    net = VPPrecond(label_dim=10, model=model_cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    sigma = jnp.array([1.0, 2.0])
    params = net.init(jax.random.PRNGKey(1), x, sigma)
    out = net.apply(params, x, sigma, class_labels=jnp.array([1, 5]))
    assert out.shape == x.shape


def test_loss_sigma_distributions():
    rng = jax.random.PRNGKey(0)
    s, w = EDMLoss().sample_sigma_weight(rng, 4096)
    # log-normal: median exp(P_mean)
    med = float(jnp.median(s))
    assert 0.2 < med < 0.45  # exp(-1.2) ~ 0.30
    s, w = VELoss().sample_sigma_weight(rng, 4096)
    assert float(s.min()) >= 0.02 - 1e-6 and float(s.max()) <= 100.0 + 1e-4
    s, w = VPLoss().sample_sigma_weight(rng, 4096)
    assert bool(jnp.all(jnp.isfinite(s)))
    np.testing.assert_allclose(np.asarray(w), 1.0 / np.asarray(s) ** 2, rtol=1e-5)


def test_edm_process_train_and_sample():
    model = GaussianDiffusion_EDM(tiny_edm_config())
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))

    @jax.jit
    def loss_fn(p, rng):
        loss, _ = model.loss_on_batch(p, rng, images, {})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert all(
        bool(jnp.all(jnp.isfinite(g))) for g in jax.tree_util.tree_leaves(grads)
    )

    samples = model.sample(params, jax.random.PRNGKey(3), num_samples=2)
    assert samples.shape == (2, 16, 16, 1)
    s = np.asarray(samples)
    assert np.all(np.isfinite(s)) and s.min() >= 0.0 and s.max() <= 1.0


@pytest.mark.parametrize(
    "disc,sched,scal,solver",
    [
        ("vp", "vp", "vp", "euler"),
        ("ve", "ve", "none", "euler"),
        ("iddpm", "linear", "none", "euler"),
        ("edm", "linear", "none", "heun"),
    ],
)
def test_generalized_sampler_design_points(disc, sched, scal, solver):
    cfg = tiny_edm_config(
        sampler="generalized",
        discretization=disc,
        schedule=sched,
        scaling=scal,
        solver=solver,
    )
    model = GaussianDiffusion_EDM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    samples = model.sample(params, jax.random.PRNGKey(1), num_samples=2)
    assert samples.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(samples)))
