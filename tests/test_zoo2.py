"""AuraFlow / Chewie / WideFormer-config smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig, get_obj_from_str

from test_zoo import _grad_ok, flux_cfg


def test_auraflow_forward_and_grads():
    cls = get_obj_from_str("xdiffusion.score_networks.auraflow.AuraFlow")
    cfg = DotConfig(
        {
            "input_spatial_size": 16,
            "input_channels": 1,
            "out_channels": 1,
            "patch_size": 4,
            "num_mmdit_layers": 1,
            "num_single_dit_layers": 2,
            "attention_head_dim": 16,
            "num_attention_heads": 4,
            "joint_attention_dim": 48,
            "caption_projection_dim": 64,
            "pos_embed_max_size": 64,
            "is_learned_sigma": False,
            "is_class_conditional": False,
        }
    )
    net = cls(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    ctx = {
        "timestep": jnp.array([0.2, 0.8]),
        "t5_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(1), (2, 6, 48)
        ),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(2), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert _grad_ok(net, params, x, ctx)


def test_chewie_forward_and_pooling_architecture():
    """Chewie is NOT Flux: double-stream blocks mix tokens with a
    parameter-free PoolFormer pooling instead of attention
    (reference layers/chewie.py:12-143)."""
    import flax

    cls = get_obj_from_str("xdiffusion.score_networks.chewie.Chewie")
    net = cls(config=flux_cfg())
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    ctx = {
        "timestep": jnp.array([0.1, 0.9]),
        "t5_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(1), (2, 6, 48)
        ),
        "clip_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(2), (2, 32)
        ),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(3), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert _grad_ok(net, params, x, ctx)

    flat = flax.traverse_util.flatten_dict(params)
    keys = {"/".join(map(str, k)) for k in flat}
    double_keys = {k for k in keys if "double_0" in k}
    # No qkv projections anywhere in the pooling double blocks; the
    # per-stream output projections exist.
    assert not any("qkv" in k for k in double_keys), double_keys
    assert any("img_proj" in k for k in double_keys)
    assert any("txt_proj" in k for k in double_keys)
    # Single blocks are standard Flux attention (qkv present).
    assert any("single_0" in k and "linear1" in k for k in keys)


def test_chewie_pooling_matches_torch_avgpool():
    """The pooling mixer reproduces torch AvgPool2d(3, stride=1, pad=1,
    count_include_pad=False) minus identity."""
    torch = __import__("pytest").importorskip("torch")
    from xdiffusion_tpu.layers.chewie import pooling_token_mixer

    x = np.random.default_rng(0).standard_normal((2, 3, 7, 10)).astype(
        np.float32
    )
    pool = torch.nn.AvgPool2d(3, stride=1, padding=1, count_include_pad=False)
    ref = (pool(torch.from_numpy(x)) - torch.from_numpy(x)).numpy()
    ours = np.asarray(pooling_token_mixer(jnp.asarray(x), 3))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_wideformer_config_resolves_to_pixart():
    # The reference's wideformer configs target pixart.PixArtAlpha with a
    # wide-but-shallow geometry; resolution must land on our PixArt.
    from xdiffusion_tpu.score_networks.pixart import PixArtAlpha

    cls = get_obj_from_str("xdiffusion.score_networks.pixart.PixArtAlpha")
    assert cls is PixArtAlpha


def test_gemma2_embedded_dataset():
    from xdiffusion_tpu.datasets import load_dataset

    ds, to_prompts = load_dataset("image/mnist_embedded_gemma_2", split="val")
    emb = ds.embeddings_for(np.array([3, 3, 7]), np.random.default_rng(0))
    assert emb.shape == (3, 300, 2304)
    # Same label (same surface pick rng state differences aside) stays in
    # the per-class table; distinct labels differ.
    assert not np.allclose(emb[0], emb[2])


def test_pixart_dyt_swaps_norms_for_dynamic_tanh():
    import flax
    import jax

    cls = get_obj_from_str("xdiffusion.score_networks.dyt.DyTScoreNetwork")
    cfg = DotConfig(
        {
            "input_channels": 1,
            "output_channels": 1,
            "input_spatial_size": 16,
            "patch_size": 4,
            "hidden_size": 64,
            "depth": 2,
            "num_heads": 2,
            "mlp_ratio": 2.0,
            "is_learned_sigma": False,
            "is_class_conditional": False,
            "num_classes": 10,
            "conditioning": {
                "signals": ["timestep"],
                "projections": {
                    "timestep": {
                        "target": "xdiffusion.layers.embedding.DiTTimestepEmbedding",
                        "params": {
                            "hidden_size": 64,
                            "frequency_embedding_size": 32,
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
            },
        }
    )
    net = cls(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    ctx = {
        "timestep": jnp.array([3, 7]),
        "context_embeddings": jax.random.normal(
            jax.random.PRNGKey(1), (2, 4, 64)
        ),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(2), x, ctx)
    flat = flax.traverse_util.flatten_dict(params["params"])
    # 2 DyT sites per block x 2 blocks + the final norm.
    alphas = [k for k in flat if k[-1] == "alpha"]
    assert len(alphas) == 5
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
