"""LTX-Video and HunyuanVideo transformer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig, get_obj_from_str


def test_ltx_video_transformer_forward():
    cls = get_obj_from_str(
        "xdiffusion.score_networks.ltx_video.LTXVideoTransformer"
    )
    cfg = DotConfig(
        {
            "input_spatial_size": 2,
            "input_channels": 16,
            "input_number_of_frames": 4,
            "is_learned_sigma": False,
            "is_class_conditional": False,
            "out_channels": 16,
            "num_layers": 2,
            "activation_fn": "gelu-approximate",
            "attention_bias": True,
            "attention_head_dim": 16,
            "num_attention_heads": 4,
            "attention_type": "default",
            "cross_attention_dim": 64,
            "caption_channels": 48,
        }
    )
    net = cls(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 2, 2, 16))
    ctx = {
        "timestep": jnp.array([0.1, 0.8]),
        "text_embeddings": jax.random.normal(jax.random.PRNGKey(1), (2, 6, 48)),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(2), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_hunyuan_video_transformer_forward():
    cls = get_obj_from_str(
        "xdiffusion.score_networks.hunyuan_video.HYVideoDiffusionTransformer"
    )
    cfg = DotConfig(
        {
            "input_spatial_size": 8,
            "input_channels": 4,
            "input_number_of_frames": 4,
            "is_learned_sigma": False,
            "is_class_conditional": False,
            "patch_size": [1, 2, 2],
            "in_channels": 4,
            "out_channels": 4,
            "hidden_size": 64,
            "heads_num": 2,
            "mlp_width_ratio": 2.0,
            "mm_double_blocks_depth": 1,
            "mm_single_blocks_depth": 2,
            "rope_dim_list": [8, 12, 12],
            "qkv_bias": True,
            "qk_norm": True,
            "qk_norm_type": "rms",
            "guidance_embed": False,
            "text_projection": "single_refiner",
            "clip_states_dim": 32,
            "text_states_dim": 48,
        }
    )
    net = cls(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 4))
    ctx = {
        "timestep": jnp.array([0.2, 0.6]),
        "text_embeddings": jax.random.normal(jax.random.PRNGKey(1), (2, 6, 48)),
        "clip_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(2), (2, 32)
        ),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(3), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
