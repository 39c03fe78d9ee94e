"""DiT score-network tests: forward contract, adaLN-Zero init, full
process loss + guided sampling through the tiny config."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
from xdiffusion_tpu.score_networks.dit import DiT


def tiny_dit_params(learned_sigma=False):
    return {
        "input_channels": 1,
        "output_channels": 1,
        "input_spatial_size": 16,
        "patch_size": 4,
        "hidden_size": 64,
        "depth": 2,
        "num_heads": 2,
        "mlp_ratio": 2.0,
        "is_learned_sigma": learned_sigma,
        "is_class_conditional": True,
        "dropout": 0.0,
        "num_classes": 10,
        "conditioning": {
            "signals": ["timestep", "classes"],
            "projections": {
                "timestep": {
                    "target": "xdiffusion.layers.embedding.DiTTimestepEmbedding",
                    "params": {"hidden_size": 64, "frequency_embedding_size": 32},
                },
                "classes": {
                    "target": "xdiffusion.layers.embedding.DiTLabelEmbedding",
                    "params": {"hidden_size": 64, "num_classes": 10},
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
                        "input_context_key": "classes",
                        "output_context_key": "class_embeddings",
                        "projection_key": "classes",
                    },
                },
                {
                    # reference configs use the typo'd spelling
                    "target": "xdiffusion.layers.embedding.DiTCombineEmbeddngs",
                    "params": {
                        "output_context_key": "timestep_embedding",
                        "source_context_keys": [
                            "class_embeddings",
                            "timestep_embedding",
                        ],
                    },
                },
            ],
            "context_transformer_layer": {
                "target": "torch.nn.Identity",
                "params": {},
            },
        },
    }


def tiny_dit_process_config():
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
                "classifier_free_guidance": {
                    "classifier_free_guidance": 1.0,
                    "unconditional_guidance_probability": 0.2,
                    "signals": ["classes"],
                    "unconditional_context": {
                        "target": "xdiffusion.context.UnconditionalClassesAdapter",
                        "params": {"num_classes": 10},
                    },
                },
                "dynamic_thresholding": {"enable": True, "p": 0.99, "c": 1.7},
                "score_network": {
                    "target": "xdiffusion.score_networks.dit.DiT",
                    "params": tiny_dit_params(),
                },
            },
            "data": {"image_size": 16, "num_channels": 1, "num_classes": 10},
        }
    )


def ctx(batch=2):
    return {
        "timestep": jnp.array([1, 5]),
        "classes": jnp.array([3, 10]),
    }


def test_dit_forward_shape_and_adaln_zero():
    net = DiT(config=DotConfig(tiny_dit_params()))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x, ctx())
    out = jax.jit(net.apply)(params, x, ctx())
    assert out.shape == (2, 16, 16, 1)
    # adaLN-Zero: all blocks and the head are identity at init, so the
    # output is exactly zero.
    assert float(jnp.abs(out).max()) == 0.0


def test_dit_learned_sigma():
    net = DiT(config=DotConfig(tiny_dit_params(learned_sigma=True)))
    x = jnp.zeros((2, 16, 16, 1))
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x, ctx())
    eps, sigma = jax.jit(net.apply)(params, x, ctx())
    assert eps.shape == (2, 16, 16, 1) and sigma.shape == (2, 16, 16, 1)


def test_dit_process_loss_and_guided_sampling():
    model = GaussianDiffusion_DDPM(tiny_dit_process_config())
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))
    loss, _ = jax.jit(
        lambda p, r: model.loss_on_batch(
            p, r, images, {"classes": jnp.array([1, 2, 3, 4])}
        )
    )(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))

    samples = model.sample(
        params,
        jax.random.PRNGKey(3),
        num_samples=2,
        context={"classes": jnp.array([3, 7])},
        classifier_free_guidance=4.0,  # dynamic thresholding engaged
        num_sampling_steps=4,
    )
    assert samples.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(samples)))
