"""Cascade + super-resolution tests: GCA input preprocessing, per-stage
loss, chained sampling."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.diffusion.cascade import GaussianDiffusionCascade
from xdiffusion_tpu.layers.super_resolution import InputPreprocessor
from xdiffusion_tpu.scheduler import DiscreteNoiseScheduler

from test_diffusion import tiny_config


def sr_stage_config():
    """4x4 -> 8x8 super-resolution stage (channel-concat input)."""
    cfg = copy.deepcopy(tiny_config().to_dict())
    cfg["diffusion"]["score_network"]["params"]["input_channels"] = 2
    cfg["diffusion"]["input_preprocessing"] = {
        "target": "xdiffusion.layers.super_resolution.InputPreprocessor",
        "params": {
            "low_resolution_size": 4,
            "super_resolution_size": 8,
            "context_input_key": "low_resolution_images",
            "apply_gaussian_conditioning_augmentation": True,
            "is_spatial": True,
        },
    }
    cfg["super_resolution"] = {
        "conditioning_key": "low_resolution_images",
        "low_resolution_size": 4,
        "sampling_augmentation_level": 0.1,
    }
    cfg["diffusion"]["score_network"]["params"]["conditioning"][
        "context_transformer_head"
    ].append(
        {
            "target": (
                "xdiffusion.layers.super_resolution."
                "GaussianConditioningAugmentationToTimestep"
            ),
            "params": {"num_features": 16, "time_embedding_mult": 4},
        }
    )
    return cfg


def base_stage_config():
    cfg = copy.deepcopy(tiny_config().to_dict())
    # base stage runs at 4x4
    cfg["diffusion"]["sampling"]["output_spatial_size"] = 4
    cfg["diffusion"]["score_network"]["params"]["input_spatial_size"] = 4
    cfg["diffusion"]["score_network"]["params"]["attention"][
        "attention_resolutions"
    ] = [2]
    cfg["data"]["image_size"] = 4
    return cfg


def test_input_preprocessor_concat_and_gca():
    prep = InputPreprocessor(
        low_resolution_size=4,
        super_resolution_size=8,
        context_input_key="low_resolution_images",
        apply_gaussian_conditioning_augmentation=True,
    )
    sched = DiscreteNoiseScheduler.create("cosine", 20)
    x = jnp.zeros((2, 8, 8, 1))
    ctx = {
        "low_resolution_images": jnp.ones((2, 4, 4, 1)) * 0.5,
        "preprocessor_rng": jax.random.PRNGKey(0),
    }
    out = prep(x, ctx, noise_scheduler=sched)
    assert out.shape == (2, 8, 8, 2)
    assert "augmentation_timestep" in ctx
    # Fixed augmentation level path.
    ctx2 = {
        "low_resolution_images": jnp.ones((2, 4, 4, 1)) * 0.5,
        "augmentation_level": 0.25,
        "preprocessor_rng": jax.random.PRNGKey(0),
    }
    out2 = prep(x, ctx2, noise_scheduler=sched)
    assert int(ctx2["augmentation_timestep"][0]) == 5  # 20 * 0.25


def test_cascade_train_and_chain_sample(tmp_path):
    base_p = tmp_path / "base.yaml"
    sr_p = tmp_path / "sr.yaml"
    base_p.write_text(yaml.safe_dump(base_stage_config()))
    sr_p.write_text(yaml.safe_dump(sr_stage_config()))

    cascade_cfg = DotConfig(
        {
            "diffusion_cascade": {
                "cascade_layer_1": {"config": str(base_p)},
                "cascade_layer_2": {"config": str(sr_p)},
            },
            "data": {"image_size": 8, "num_channels": 1, "num_classes": 10},
        }
    )
    model = GaussianDiffusionCascade(cascade_cfg)
    assert len(model.models()) == 2
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1))

    @jax.jit
    def loss_fn(p, r):
        loss, m = model.loss_on_batch(p, r, images, {})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert all(
        bool(jnp.all(jnp.isfinite(g))) for g in jax.tree_util.tree_leaves(grads)
    )

    samples = model.sample(params, jax.random.PRNGKey(3), num_samples=2)
    assert samples.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(samples)))
