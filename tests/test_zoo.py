"""Smoke tests for the remaining score-network zoo: Flux (+DyT), Sana,
DiffuSSM — forward contract, jit, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xdiffusion_tpu.config import DotConfig, get_obj_from_str


def _grad_ok(net, params, x, ctx):
    def loss(p):
        out = net.apply(p, x, ctx)
        if isinstance(out, tuple):
            out = out[0]
        # (out - 1)^2: nonzero gradient even for zero-init output heads.
        return jnp.sum((out - 1.0) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    return sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0


def flux_cfg():
    return DotConfig(
        {
            "input_spatial_size": 16,
            "input_channels": 1,
            "in_channels": 16,  # C * p * p = 1*4*4
            "vec_in_dim": 32,
            "context_in_dim": 48,
            "hidden_size": 64,
            "mlp_ratio": 2.0,
            "num_heads": 2,
            "depth": 1,
            "depth_single_blocks": 2,
            "axes_dim": [8, 12, 12],
            "theta": 10000,
            "qkv_bias": True,
            "guidance_embed": False,
            "patch_size": 4,
            "is_learned_sigma": False,
            "is_class_conditional": False,
        }
    )


@pytest.mark.parametrize(
    "target", ["xdiffusion.score_networks.flux.Flux",
               "xdiffusion.score_networks.flux_dyt.Flux"]
)
def test_flux_forward_and_grads(target):
    cls = get_obj_from_str(target)
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
    assert bool(jnp.all(jnp.isfinite(out)))
    assert _grad_ok(net, params, x, ctx)


def test_sana_forward_and_grads():
    cls = get_obj_from_str("xdiffusion.score_networks.sana.SanaScoreNetwork")
    cfg = DotConfig(
        {
            "input_spatial_size": 16,
            "patch_size": 4,
            "in_channels": 1,
            "input_channels": 1,
            "out_channels": 1,
            "caption_channels": 96,
            "attention_head_dim": 16,
            "num_attention_heads": 4,
            "num_cross_attention_heads": 2,
            "cross_attention_head_dim": 32,
            "cross_attention_dim": 64,
            "dropout": 0.0,
            "mlp_ratio": 2.0,
            "num_layers": 2,
            "is_learned_sigma": False,
            "is_class_conditional": False,
        }
    )
    net = cls(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    ctx = {
        "timestep": jnp.array([5, 10]),
        "text_embeddings": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 96)),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(2), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert _grad_ok(net, params, x, ctx)


def test_relu_linear_attention_matches_softmax_free_form():
    from xdiffusion_tpu.score_networks.sana import relu_linear_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 5, 4))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 5, 4))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 5, 4))
    out = relu_linear_attention(q, k, v)
    # Naive reference: per-query weighted mean with relu kernel weights.
    qr, kr = np.maximum(np.asarray(q)[0, 0], 0), np.maximum(np.asarray(k)[0, 0], 0)
    vr = np.asarray(v)[0, 0]
    weights = qr @ kr.T  # (5, 5)
    expected = (weights @ vr) / (weights.sum(axis=1, keepdims=True) + 1e-15)
    np.testing.assert_allclose(np.asarray(out)[0, 0], expected, atol=1e-4)


def test_diffussm_forward_and_grads():
    cls = get_obj_from_str("xdiffusion.score_networks.diffussm.DiffusionSSM")
    cfg = DotConfig(
        {
            "n_layers": 2,
            "d_model": 32,
            "d_input": 1,
            "input_channels": 1,
            "output_channels": 1,
            "input_spatial_size": 8,
            "M": 2,
            "is_learned_sigma": False,
            "is_class_conditional": True,
            "num_classes": 10,
            "block_config": {
                "target": "xdiffusion.layers.s4d.SequenceResidualBlock",
                "params": {"bidirectional": True, "prenorm": True},
            },
        }
    )
    net = cls(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    ctx = {"timestep": jnp.array([3, 7]), "classes": jnp.array([1, 9])}
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert _grad_ok(net, params, x, ctx)


def test_s4d_kernel_behaves_like_recurrence():
    # The FFT convolution must equal the explicit diagonal recurrence.
    from xdiffusion_tpu.layers.s4d import S4D

    net = S4D(d_model=4, d_state=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 4))
    params = net.init(jax.random.PRNGKey(1), x)
    y = net.apply(params, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    # Causality: zeroing the tail of the input must not change the head.
    x2 = x.at[:, 6:].set(0.0)
    y2 = net.apply(params, x2)
    np.testing.assert_allclose(
        np.asarray(y[:, :6]), np.asarray(y2[:, :6]), atol=1e-4
    )


def test_wideformer_forward_and_grads():
    """WideFormer (reference score_networks/wideformer.py:55-209): width
    parallel double-stream blocks per layer, feature-concat re-viewed as a
    (width*L)-token sequence, Conv1d token mixer back to L tokens."""
    cls = get_obj_from_str("xdiffusion.score_networks.wideformer.WideFormer")
    cfg = flux_cfg().to_dict()
    cfg.update({"transformer_width": 2, "depth": 2, "max_text_tokens": 6})
    net = cls(config=DotConfig(cfg))
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
    # Width is visible in the parameter tree: parallel blocks per layer and
    # a token mixer on every block past layer 0.
    top = params["params"]
    assert "layer0_block0" in top and "layer0_block1" in top
    assert "token_mixer" in top["layer1_block0"]
    assert "token_mixer" not in top["layer0_block0"]
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    assert _grad_ok(net, params, x, ctx)
