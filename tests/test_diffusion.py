"""End-to-end diffusion process tests: loss, gradients, and the
single-scan sampling loop (ancestral + DDIM + v-param/continuous)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
from xdiffusion_tpu.samplers.ddim import DDIMSampler


def tiny_config(
    parameterization="epsilon",
    scheduler="discrete",
    learned_sigma=False,
    num_scales=20,
    cfg_prob=0.0,
    class_conditional=False,
):
    if scheduler == "discrete":
        sched = {
            "target": "xdiffusion.scheduler.DiscreteNoiseScheduler",
            "params": {
                "num_scales": num_scales,
                # cosine: valid at any step count (linear betas blow past 1
                # below ~100 steps due to the 1000/T rescale).
                "schedule_type": "cosine",
                "loss_type": "l2",
            },
        }
    else:
        sched = {
            "target": "xdiffusion.scheduler.ContinuousNoiseScheduler",
            "params": {
                "num_scales": num_scales,
                "logsnr_schedule": "cosine",
                "loss_type": "l2",
                "logsnr_min": -20.0,
                "logsnr_max": 20.0,
            },
        }
    proj_target = (
        "xdiffusion.layers.embedding.TimestepEmbeddingProjection"
        if scheduler == "discrete"
        else "xdiffusion.layers.embedding.InvCosTimestepEmbeddingProjection"
    )
    return DotConfig(
        {
            "diffusion": {
                "parameterization": parameterization,
                "sampling": {
                    "output_channels": 1,
                    "output_spatial_size": 8,
                    "target": "xdiffusion.samplers.ancestral.AncestralSampler",
                    "params": {},
                },
                "noise_scheduler": sched,
                "context_preprocessing": [
                    {
                        "target": "xdiffusion.context.IgnoreContextAdapter",
                        "params": {},
                    }
                ],
                "input_preprocessing": {
                    "target": "xdiffusion.context.IgnoreInputPreprocessor",
                    "params": {},
                },
                "classifier_free_guidance": {
                    "classifier_free_guidance": 1.0,
                    "unconditional_guidance_probability": cfg_prob,
                    "signals": ["classes"] if class_conditional else [],
                    "unconditional_context": {
                        "target": (
                            "xdiffusion.context.UnconditionalClassesAdapter"
                            if class_conditional
                            else "torch.nn.Identity"
                        ),
                        "params": {"num_classes": 10} if class_conditional else {},
                    },
                },
                "score_network": {
                    "target": "xdiffusion.score_networks.unet.Unet",
                    "params": {
                        "input_channels": 1,
                        "output_channels": 1,
                        "input_spatial_size": 8,
                        "num_features": 16,
                        "channel_multipliers": [1, 2],
                        "num_resnet_blocks": 1,
                        "use_scale_shift_norm": True,
                        "resamp_with_conv": False,
                        "resblock_updown": False,
                        "resnet_block_type": "biggan",
                        "dropout": 0.0,
                        "is_learned_sigma": learned_sigma,
                        "is_class_conditional": class_conditional,
                        "num_classes": 10,
                        "attention": {
                            "attention_resolutions": [4],
                            "attention_heads": 2,
                            "attention_channels": 16,
                            "is_causal": False,
                        },
                        "conditioning": {
                            "signals": ["timestep"],
                            "projections": {
                                "timestep": {
                                    "target": proj_target,
                                    "params": {
                                        "num_features": 16,
                                        "time_embedding_mult": 4,
                                        **(
                                            {"max_time": 1.0}
                                            if scheduler != "discrete"
                                            else {}
                                        ),
                                    },
                                }
                            },
                            "context_transformer_head": [
                                {
                                    "target": "xdiffusion.layers.embedding.RunProjection",
                                    "params": {
                                        "input_context_key": "timestep",
                                        "output_context_key": "timestep_embedding",
                                        "projection_key": "timestep",
                                    },
                                }
                            ],
                            "context_transformer_layer": {
                                "target": "xdiffusion.layers.attention.SpatialCrossAttention",
                                "params": {
                                    "context_dim": -1,
                                    "heads": 2,
                                    "dim_head": 16,
                                    "dropout": 0.0,
                                },
                            },
                        },
                    },
                },
            },
            "data": {"image_size": 8, "num_channels": 1, "num_classes": 10},
        }
    )


def test_loss_and_grads_finite():
    model = GaussianDiffusion_DDPM(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 1))

    @jax.jit
    def loss_fn(p, rng):
        loss, metrics = model.loss_on_batch(p, rng, images, {})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # Gradient must be nonzero somewhere.
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0


def test_ancestral_sampling_scan_discrete():
    model = GaussianDiffusion_DDPM(tiny_config(num_scales=10))
    params = model.init_params(jax.random.PRNGKey(0))
    samples = model.sample(params, jax.random.PRNGKey(1), num_samples=2)
    assert samples.shape == (2, 8, 8, 1)
    s = np.asarray(samples)
    assert np.all(np.isfinite(s))
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_ddim_sampling_respaced_discrete():
    # 50-step native schedule sampled with 5 DDIM steps.
    model = GaussianDiffusion_DDPM(tiny_config(num_scales=50))
    params = model.init_params(jax.random.PRNGKey(0))
    samples = model.sample(
        params,
        jax.random.PRNGKey(1),
        num_samples=2,
        num_sampling_steps=5,
        sampler=DDIMSampler(),
    )
    assert samples.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(samples)))


def test_v_param_continuous_with_ddim():
    model = GaussianDiffusion_DDPM(
        tiny_config(parameterization="v", scheduler="continuous", num_scales=64)
    )
    params = model.init_params(jax.random.PRNGKey(0))
    loss, metrics = jax.jit(
        lambda p, r: model.loss_on_batch(
            p, r, jnp.zeros((2, 8, 8, 1)) + 0.5, {}
        )
    )(params, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    samples = model.sample(
        params,
        jax.random.PRNGKey(1),
        num_samples=2,
        num_sampling_steps=6,
        sampler=DDIMSampler(),
    )
    assert np.all(np.isfinite(np.asarray(samples)))


def test_learned_sigma_loss_has_vb_term():
    model = GaussianDiffusion_DDPM(tiny_config(learned_sigma=True))
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 1))
    loss, metrics = jax.jit(
        lambda p, r: model.loss_on_batch(p, r, images, {})
    )(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert float(metrics["vb_loss"]) != 0.0


def test_cfg_training_dropout_and_guided_sampling():
    model = GaussianDiffusion_DDPM(
        tiny_config(cfg_prob=0.5, class_conditional=True)
    )
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 1))
    ctx = {"classes": jnp.array([1, 2, 3, 4])}
    loss, _ = jax.jit(
        lambda p, r: model.loss_on_batch(p, r, images, ctx)
    )(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    # Guided sampling: 2x-batched CFG forward inside the scan.
    samples = model.sample(
        params,
        jax.random.PRNGKey(1),
        num_samples=2,
        context={"classes": jnp.array([3, 7])},
        classifier_free_guidance=2.0,
        num_sampling_steps=4,
    )
    assert samples.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(samples)))
