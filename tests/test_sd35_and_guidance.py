"""SD3.5 MMDiT-X + reconstruction guidance tests."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig, get_obj_from_str
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
from xdiffusion_tpu.samplers.ancestral import AncestralSampler

from test_sd3 import tiny_sd3_config
from test_video import tiny_video_config


def test_sd35_dual_attention_blocks():
    cls = get_obj_from_str(
        "xdiffusion.score_networks.sd35.SD35Transformer2DModel"
    )
    cfg_dict = copy.deepcopy(
        tiny_sd3_config().to_dict()["diffusion"]["score_network"]["params"]
    )
    cfg_dict["dual_attention_layers"] = 1
    net = cls(config=DotConfig(cfg_dict))
    x = jnp.zeros((2, 16, 16, 1))
    ctx = {
        "timestep": jnp.zeros((2,), jnp.float32),
        "text_embeddings": jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64)),
        "pooled_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(1), (2, 48)
        ),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(2), x, ctx)
    # Dual-attention params exist only in block 0.
    flat = params["params"]
    assert "qkv_x2" in flat["block_0"]
    assert "qkv_x2" not in flat["block_1"]
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == (2, 16, 16, 1)


def test_reconstruction_guidance_pins_overlap():
    cfg = tiny_video_config(frames=4)
    model = GaussianDiffusion_DDPM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    sampler = AncestralSampler(
        reconstruction_guidance=True, omega=2.0, num_frame_overlap=2
    )
    # Conditioning frames in model space.
    x_a = jnp.zeros((2, 4, 8, 8, 1)) + 0.3
    samples = model.sample(
        params,
        jax.random.PRNGKey(1),
        num_samples=2,
        context={"x_a": x_a},
        sampler=sampler,
        num_sampling_steps=4,
    )
    s = np.asarray(samples)
    assert s.shape == (2, 4, 8, 8, 1)
    assert np.all(np.isfinite(s))
    # The final-step x_hat splices x_a into the overlap frames:
    # unnormalized 0.3 -> 0.65.
    np.testing.assert_allclose(s[:, :2], 0.65, atol=1e-4)
