"""Score-network forward shape/contract tests (fake-context spec, mirroring
the reference's print_model_summary contract check)."""

import jax
import jax.numpy as jnp
import pytest

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.score_networks.unet import Unet


def small_unet_config(
    learned_sigma=False, class_conditional=False, block_type="biggan"
):
    return DotConfig(
        {
            "input_channels": 1,
            "output_channels": 1,
            "input_spatial_size": 32,
            "num_features": 32,
            "channel_multipliers": [1, 2, 2],
            "num_resnet_blocks": 1,
            "use_scale_shift_norm": True,
            "resamp_with_conv": False,
            "resblock_updown": False,
            "resnet_block_type": block_type,
            "dropout": 0.1,
            "is_learned_sigma": learned_sigma,
            "is_class_conditional": class_conditional,
            "num_classes": 10,
            "attention": {
                "attention_resolutions": [16],
                "attention_heads": 2,
                "attention_channels": 32,
                "is_causal": False,
            },
            "conditioning": {
                "signals": ["timestep"],
                "projections": {
                    "timestep": {
                        "target": "xdiffusion.layers.embedding.TimestepEmbeddingProjection",
                        "params": {"num_features": 32, "time_embedding_mult": 4},
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
                        "dropout": 0.1,
                    },
                },
            },
        }
    )


def fake_context(batch=2):
    return {"timestep": jnp.zeros((batch,), dtype=jnp.int32) + 10}


def jit_init(net, x, ctx):
    # One fused compile for the whole init instead of ~100 tiny per-param
    # compiles (each costs ~1s on this backend).
    return jax.jit(net.init)(jax.random.PRNGKey(0), x, ctx)


def test_unet_forward_learned_sigma_and_jit():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))

    net = Unet(config=small_unet_config())
    params = jit_init(net, x, fake_context())
    out = jax.jit(net.apply)(params, x, fake_context())
    assert out.shape == (2, 32, 32, 1)
    assert bool(jnp.all(jnp.isfinite(out)))

    # Learned sigma doubles output channels and splits.
    net_ls = Unet(config=small_unet_config(learned_sigma=True))
    params_ls = jit_init(net_ls, x, fake_context())
    eps, logvar = jax.jit(net_ls.apply)(params_ls, x, fake_context())
    assert eps.shape == (2, 32, 32, 1)
    assert logvar.shape == (2, 32, 32, 1)


def test_unet_class_conditional_and_null_class():
    net = Unet(config=small_unet_config(class_conditional=True))
    x = jnp.zeros((2, 32, 32, 1))
    ctx = dict(fake_context())
    ctx["classes"] = jnp.array([3, 10])  # 10 = NULL class for CFG
    params = jit_init(net, x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == (2, 32, 32, 1)


def test_unet_train_mode_dropout_rng():
    net = Unet(config=small_unet_config())
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    params = jit_init(net, x, fake_context())

    @jax.jit
    def fwd_train(p, x, t, rng):
        return net.apply(
            p,
            x,
            {"timestep": t},
            deterministic=False,
            rngs={"dropout": rng},
        )

    out = fwd_train(params, x, jnp.array([5, 500]), jax.random.PRNGKey(2))
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
