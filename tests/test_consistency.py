"""Consistency model tests: schedules, training/distillation losses,
one-step and multistep sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.diffusion.consistency import (
    GaussianDiffusion_ConsistencyModel,
    get_weightings,
)
from xdiffusion_tpu.layers.ema import create_ema_and_scales_fn
from xdiffusion_tpu.samplers.consistency import (
    GeneralizedConsistencySampler,
    get_sigmas_karras,
)

from test_edm import tiny_song_unet


def tiny_consistency_config(sampler="onestep", distillation=False):
    if sampler == "onestep":
        sampling = {
            "output_channels": 1,
            "output_spatial_size": 16,
            "target": "xdiffusion.samplers.consistency.OneStepConsistencySampler",
            "params": {
                "sigma_min": 0.002,
                "sigma_max": 80,
                "rho": 7,
                "clip_denoised": True,
            },
        }
    else:
        sampling = {
            "output_channels": 1,
            "output_spatial_size": 16,
            "target": "xdiffusion.samplers.consistency.GeneralizedConsistencySampler",
            "params": {
                "steps": 40,
                "sigma_min": 0.002,
                "sigma_max": 80,
                "rho": 7,
                "clip_denoised": True,
                "sampler": "multistep",
                "multistep": [0, 22, 39],
            },
        }
    loss_target = (
        "xdiffusion.diffusion.consistency.ConsistencyDistillationLoss"
        if distillation
        else "xdiffusion.diffusion.consistency.ConsistencyTrainingLoss"
    )
    return DotConfig(
        {
            "target": "xdiffusion.diffusion.consistency.GaussianDiffusion_ConsistencyModel",
            "diffusion": {
                "sampling": sampling,
                "consistency_model": {
                    "rho": 7,
                    "target_ema": {
                        "target_ema_mode": "adaptive",
                        "start_ema": 0.95,
                        "scale_mode": "progressive",
                        "start_scales": 2,
                        "end_scales": 200,
                    },
                },
                "exponential_moving_average": {
                    "target_ema_mode": "fixed",
                    "start_ema": 0.9999,
                    "scale_mode": "fixed",
                    "start_scales": 0,
                },
                "loss": {
                    "target": loss_target,
                    "params": {
                        "sigma_data": 0.5,
                        "rho": 7.0,
                        "weight_schedule": "uniform",
                        "loss_norm": "l2",
                    },
                },
                "score_network": {
                    "target": "xdiffusion.score_networks.edm.EDMPrecond",
                    "params": {
                        "img_resolution": 16,
                        "img_channels": 1,
                        "label_dim": 0,
                        "sigma_min": 0.002,
                        "sigma_max": 80.0,
                        "sigma_data": 0.5,
                        "model": tiny_song_unet(),
                    },
                },
            },
            "data": {"image_size": 16, "num_channels": 1, "num_classes": 10},
        }
    )


def test_ema_and_scales_schedules():
    fn = create_ema_and_scales_fn(
        target_ema_mode="adaptive",
        start_ema=0.95,
        scale_mode="progressive",
        start_scales=2,
        end_scales=200,
        total_steps=1000,
    )
    ema0, n0 = fn(0)
    ema_end, n_end = fn(1000)
    assert n0 == 2 and n_end == 201
    assert 0 < ema0 < 1 and ema_end > ema0  # adaptive: slower EMA as N grows

    # progdist halving schedule
    fn2 = create_ema_and_scales_fn(
        target_ema_mode="fixed",
        start_ema=1.0,
        scale_mode="progdist",
        start_scales=16,
        total_steps=800,
        distill_steps_per_iter=100,
    )
    assert fn2(0)[1] == 16 and fn2(100)[1] == 8 and fn2(200)[1] == 4


def test_weightings():
    snrs = jnp.array([1.0, 4.0])
    np.testing.assert_allclose(get_weightings("uniform", snrs, 0.5), [1, 1])
    np.testing.assert_allclose(get_weightings("snr", snrs, 0.5), [1, 4])
    np.testing.assert_allclose(get_weightings("karras", snrs, 0.5), [5, 8])
    np.testing.assert_allclose(
        get_weightings("truncated-snr", jnp.array([0.5, 4.0]), 0.5), [1, 4]
    )


def test_karras_sigmas():
    s = get_sigmas_karras(10, 0.002, 80.0)
    assert s[0] == 80.0 and abs(s[-2] - 0.002) < 1e-9 and s[-1] == 0.0
    assert np.all(np.diff(s) < 0)


def test_consistency_training_loss_and_target_update():
    model = GaussianDiffusion_ConsistencyModel(tiny_consistency_config())
    params = model.init_params(jax.random.PRNGKey(0))
    assert set(params.keys()) == {"score", "target", "ema"}
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))

    @jax.jit
    def loss_fn(score_params, other, rng, num_scales):
        p = {"score": score_params, **other}
        loss, _ = model.loss_on_batch(
            p, rng, images, {"num_scales": num_scales}
        )
        return loss

    other = {k: v for k, v in params.items() if k != "score"}
    loss, grads = jax.value_and_grad(loss_fn)(
        params["score"], other, jax.random.PRNGKey(2), jnp.int32(11)
    )
    assert np.isfinite(float(loss))
    total = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert total > 0.0

    # EMA target moves toward score (pure update).
    params2 = model.update_auxiliary_params(
        params, target_ema=jnp.float32(0.5), ema_rate=0.9999
    )
    assert params2["target"] is not params["target"]


def test_consistency_distillation_loss_with_teacher():
    model = GaussianDiffusion_ConsistencyModel(
        tiny_consistency_config(distillation=True)
    )
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1))

    # Frozen "teacher": the same consistency net at fixed params.
    net = model.score_network()
    teacher_params = params["score"]

    def teacher_denoise(x, t):
        return net.apply(teacher_params, x, t)

    loss, _ = jax.jit(
        lambda p, r: model.loss_on_batch(
            p,
            r,
            images,
            {"num_scales": jnp.int32(8)},
            teacher_denoise_fn=teacher_denoise,
        )
    )(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_one_step_and_multistep_sampling():
    model = GaussianDiffusion_ConsistencyModel(tiny_consistency_config())
    params = model.init_params(jax.random.PRNGKey(0))
    s1 = model.sample(params, jax.random.PRNGKey(1), num_samples=2)
    assert s1.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(s1)))

    multi = GeneralizedConsistencySampler(
        steps=40, multistep=[0, 22, 39], clip_denoised=True
    )
    s2 = model.sample(
        params, jax.random.PRNGKey(1), num_samples=2, sampler=multi
    )
    assert s2.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(s2)))


@pytest.mark.parametrize(
    "kind", ["heun", "dpm", "ancestral", "euler", "progdist", "onestep"]
)
def test_karras_sampler_family(kind):
    """Every reference sampler name (consistency.py:139-147 dispatch) runs
    as a scan program and produces finite samples in [-1, 1]."""
    model = GaussianDiffusion_ConsistencyModel(tiny_consistency_config())
    params = model.init_params(jax.random.PRNGKey(0))
    sampler = GeneralizedConsistencySampler(
        steps=6, sampler=kind, s_churn=0.5 if kind in ("heun", "dpm") else 0.0
    )
    out = model.sample(params, jax.random.PRNGKey(1), num_samples=2, sampler=sampler)
    arr = np.asarray(out)
    assert arr.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(arr))
    assert arr.min() >= -1.0 - 1e-5 and arr.max() <= 1.0 + 1e-5


def test_heun_sampler_matches_loop_reference():
    """The scanned Heun program equals a plain-python Karras Algorithm-2
    loop over the same denoiser (reference consistency.py:263-302)."""
    model = GaussianDiffusion_ConsistencyModel(tiny_consistency_config())
    params = model.init_params(jax.random.PRNGKey(0))
    net = model.score_network()
    steps = 5
    sampler = GeneralizedConsistencySampler(steps=steps, sampler="heun")
    sigma_min = max(sampler.sigma_min, net.sigma_min)
    sigma_max = min(sampler.sigma_max, net.sigma_max)
    sigmas = get_sigmas_karras(steps, sigma_min, sigma_max, sampler.rho)

    rng = jax.random.PRNGKey(1)
    latents = jax.random.normal(rng, (2, 16, 16, 1))
    net_params = params.get("ema") or params["score"]

    got = sampler.build_sample_loop(model, (2, 16, 16, 1))(
        net_params, rng, latents
    )

    def denoise(x, sigma):
        return jnp.clip(
            net.apply(net_params, x, jnp.full((2,), sigma, jnp.float32)),
            -1.0,
            1.0,
        )

    x = latents * sigma_max
    key = rng
    for i in range(len(sigmas) - 1):
        key, nk = jax.random.split(key)
        _ = jax.random.normal(nk, x.shape, x.dtype)  # churn draw (gamma=0)
        den = denoise(x, sigmas[i])
        d = (x - den) / sigmas[i]
        dt = sigmas[i + 1] - sigmas[i]
        if sigmas[i + 1] == 0:
            x = x + d * dt
        else:
            x_2 = x + d * dt
            den_2 = denoise(x_2, sigmas[i + 1])
            d_2 = (x_2 - den_2) / sigmas[i + 1]
            x = x + (d + d_2) / 2 * dt
    want = jnp.clip(x, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
