"""Efficient UNet (Imagen) tests: D/U block pyramid, super-res concat."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.score_networks.efficient_unet import Unet


def tiny_efficient_cfg(input_channels=1):
    return DotConfig(
        {
            "input_channels": input_channels,
            "output_channels": 1,
            "input_spatial_size": 16,
            "num_features": 16,
            "channel_multipliers": [1, 2],
            "num_resnet_blocks": [1, 2],
            "use_scale_shift_norm": True,
            "resamp_with_conv": False,
            "resblock_updown": False,
            "resnet_block_type": "biggan",
            "dropout": 0.0,
            "is_learned_sigma": False,
            "is_class_conditional": False,
            "num_classes": 10,
            "attention": {
                "attention_resolutions": [8],
                "attention_heads": 2,
                "attention_channels": 16,
                "is_causal": False,
            },
            "conditioning": {
                "signals": ["timestep"],
                "projections": {
                    "timestep": {
                        "target": "xdiffusion.layers.embedding.TimestepEmbeddingProjection",
                        "params": {"num_features": 16, "time_embedding_mult": 4},
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
        }
    )


def test_efficient_unet_forward():
    net = Unet(config=tiny_efficient_cfg())
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    ctx = {"timestep": jnp.array([1, 5])}
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == (2, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_efficient_unet_super_res_input_channels():
    # Super-resolution stages concatenate low-res conditioning -> 2 input
    # channels (reference imagen_8x8_to_32x32.yaml surface).
    net = Unet(config=tiny_efficient_cfg(input_channels=2))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 2))
    ctx = {"timestep": jnp.array([1, 5])}
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == (2, 16, 16, 1)
