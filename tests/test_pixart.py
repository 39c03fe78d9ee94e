"""PixArt-alpha tests: adaLN-single blocks, T5-fallback text path, full
process loss + guided sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM


def tiny_pixart_config():
    return DotConfig(
        {
            "diffusion": {
                "parameterization": "epsilon",
                "sampling": {
                    "output_channels": 1,
                    "output_spatial_size": 16,
                    "target": "xdiffusion.samplers.ancestral.AncestralSampler",
                    "params": {},
                },
                "noise_scheduler": {
                    "target": "xdiffusion.scheduler.DiscreteNoiseScheduler",
                    "params": {
                        "num_scales": 8,
                        "schedule_type": "cosine",
                        "loss_type": "l2",
                    },
                },
                "context_preprocessing": [
                    {"target": "xdiffusion.context.IgnoreContextAdapter",
                     "params": {}}
                ],
                "classifier_free_guidance": {
                    "classifier_free_guidance": 1.0,
                    "unconditional_guidance_probability": 0.1,
                    "signals": ["text_tokens"],
                    "unconditional_context": {
                        "target": "xdiffusion.context.UnconditionalTextPromptsAdapter",
                        "params": {},
                    },
                },
                "score_network": {
                    "target": "xdiffusion.score_networks.pixart.PixArtAlpha",
                    "params": {
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
                        "drop_path": 0.1,
                        "num_classes": 10,
                        "context_key": "context_embeddings",
                        "conditioning": {
                            "signals": [
                                "timestep",
                                "text_tokens",
                                "text_prompts",
                            ],
                            "projections": {
                                "timestep": {
                                    "target": "xdiffusion.layers.embedding.DiTTimestepEmbedding",
                                    "params": {
                                        "hidden_size": 64,
                                        "frequency_embedding_size": 32,
                                    },
                                },
                                "text_tokens": {
                                    "target": "xdiffusion.layers.embedding.T5TextTokensToEmbedding",
                                    "params": {
                                        "model_name": "google/t5-v1_1-base",
                                        "d_model": 96,
                                    },
                                },
                                "text_prompts": {
                                    "target": "xdiffusion.layers.embedding.T5TextPromptsToTokens",
                                    "params": {
                                        "max_length": 12,
                                        "model_name": "google/t5-v1_1-base",
                                    },
                                },
                            },
                            "context_transformer_head": [
                                {
                                    "target": "xdiffusion.layers.embedding.RunProjection",
                                    "params": {
                                        "input_context_key": "timestep",
                                        "output_context_key": "timestep_embedding",
                                        "projection_key": "timestep",
                                    },
                                },
                                {
                                    "target": "xdiffusion.layers.embedding.RunProjection",
                                    "params": {
                                        "input_context_key": "text_prompts",
                                        "output_context_key": "text_tokens",
                                        "projection_key": "text_prompts",
                                    },
                                },
                                {
                                    "target": "xdiffusion.layers.embedding.RunProjection",
                                    "params": {
                                        "input_context_key": "text_tokens",
                                        "output_context_key": "text_embeddings",
                                        "projection_key": "text_tokens",
                                    },
                                },
                                {
                                    "target": "xdiffusion.layers.embedding.ContextProjection",
                                    "params": {
                                        "input_context_key": "text_embeddings",
                                        "output_context_key": "context_embeddings",
                                        "in_features": 96,
                                        "hidden_features": 64,
                                        "out_features": 64,
                                        "custom_initialization": True,
                                    },
                                },
                            ],
                            "context_transformer_layer": {
                                "target": "torch.nn.Identity",
                                "params": {},
                            },
                        },
                    },
                },
            },
            "data": {"image_size": 16, "num_channels": 1, "num_classes": 10},
        }
    )


def test_pixart_host_tokenization_and_loss():
    model = GaussianDiffusion_DDPM(tiny_pixart_config())
    # Host side: prompts resolve to T5-vocab tokens before jit.
    ctx = model.preprocess_context({"text_prompts": ["three", "seven"]})
    assert "text_tokens" in ctx and "text_prompts" not in ctx
    assert ctx["text_tokens"].shape == (2, 12)
    assert int(ctx["text_tokens"].max()) < 32128

    # init needs text tokens in the fake context.
    x = jnp.zeros((2, 16, 16, 1))
    init_ctx = {
        "timestep": jnp.zeros((2,), dtype=jnp.int32),
        "text_tokens": ctx["text_tokens"],
    }
    net = model.score_network()
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, init_ctx)
    out = jax.jit(net.apply)(params, x, init_ctx)
    assert out.shape == (2, 16, 16, 1)

    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1))
    loss, _ = jax.jit(
        lambda p, r, tok: model.loss_on_batch(
            p, r, images, {"text_tokens": tok}
        )
    )(params, jax.random.PRNGKey(2), ctx["text_tokens"])
    assert np.isfinite(float(loss))


def test_pixart_text_guided_sampling():
    model = GaussianDiffusion_DDPM(tiny_pixart_config())
    ctx = model.preprocess_context({"text_prompts": ["one", "two"]})
    net = model.score_network()
    x = jnp.zeros((2, 16, 16, 1))
    params = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        x,
        {"timestep": jnp.zeros((2,), jnp.int32), "text_tokens": ctx["text_tokens"]},
    )
    samples = model.sample(
        params,
        jax.random.PRNGKey(1),
        num_samples=2,
        context={"text_prompts": ["one", "two"]},
        classifier_free_guidance=2.0,
        num_sampling_steps=4,
    )
    assert samples.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(samples)))
