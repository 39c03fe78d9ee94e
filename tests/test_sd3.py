"""SD3 MMDiT tests + FID harness tests."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.context import SD3TextPromptsPreprocessor
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM


def tiny_sd3_config():
    return DotConfig(
        {
            "diffusion": {
                "parameterization": "rectified_flow",
                "sampling": {
                    "output_channels": 1,
                    "output_spatial_size": 16,
                    "target": "xdiffusion.samplers.rectified_flow.AncestralSampler",
                    "params": {},
                },
                "noise_scheduler": {
                    "target": "xdiffusion.scheduler.DiscreteRectifiedFlowNoiseScheduler",
                    "params": {
                        "steps": 8,
                        "max_time": 1.0,
                        "distribution": "logit-normal",
                    },
                },
                "sde": {
                    "target": "xdiffusion.sde.rectified_flow.RectifiedFlow",
                    "params": {"N": 8, "T": 1.0},
                },
                "context_preprocessing": [
                    {
                        "target": "xdiffusion.context.SD3TextPromptsPreprocessor",
                        "params": {
                            "t5_max_length": 8,
                            "joint_dim": 64,
                            "pooled_dim": 48,
                        },
                    }
                ],
                "classifier_free_guidance": {
                    "classifier_free_guidance": 0.0,
                    "unconditional_guidance_probability": 0.0,
                    "signals": [],
                    "unconditional_context": {
                        "target": "torch.nn.Identity",
                        "params": {},
                    },
                },
                "score_network": {
                    "target": "xdiffusion.score_networks.sd3.SD3Transformer2DModel",
                    "params": {
                        "input_spatial_size": 16,
                        "input_channels": 1,
                        "is_learned_sigma": False,
                        "is_class_conditional": False,
                        "sample_size": 16,
                        "patch_size": 4,
                        "in_channels": 1,
                        "out_channels": 1,
                        "num_layers": 2,
                        "attention_head_dim": 16,
                        "num_attention_heads": 4,
                        "joint_attention_dim": 64,
                        "caption_projection_dim": 64,
                        "pooled_projection_dim": 48,
                        "pos_embed_max_size": 4,
                        "conditioning": {
                            "signals": [],
                            "projections": {},
                            "context_transformer_head": [
                                {"target": "torch.nn.Identity", "params": {}}
                            ],
                        },
                    },
                },
            },
            "data": {"image_size": 16, "num_channels": 1, "num_classes": 10},
        }
    )


def sd3_context(model, prompts):
    return model.preprocess_context({"text_prompts": prompts})


def test_sd3_preprocessor_contract():
    prep = SD3TextPromptsPreprocessor(
        t5_max_length=8, joint_dim=64, pooled_dim=48
    )
    ctx = prep({"text_prompts": ["three", "eight"]})
    assert ctx["text_embeddings"].shape == (2, 8, 64)
    assert ctx["pooled_text_embeddings"].shape == (2, 48)
    ctx2 = prep({"text_prompts": ["three", "eight"]})
    np.testing.assert_array_equal(
        np.asarray(ctx["text_embeddings"]), np.asarray(ctx2["text_embeddings"])
    )


def test_sd3_rectified_flow_train_and_sample():
    model = GaussianDiffusion_DDPM(tiny_sd3_config())
    ctx = sd3_context(model, ["one", "two"])
    net = model.score_network()
    x = jnp.zeros((2, 16, 16, 1))
    init_ctx = {
        "timestep": jnp.zeros((2,), jnp.float32),
        "text_embeddings": ctx["text_embeddings"],
        "pooled_text_embeddings": ctx["pooled_text_embeddings"],
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, init_ctx)
    out = jax.jit(net.apply)(params, x, init_ctx)
    assert out.shape == (2, 16, 16, 1)

    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1))
    loss, _ = jax.jit(
        lambda p, r, te, pe: model.loss_on_batch(
            p,
            r,
            images,
            {"text_embeddings": te, "pooled_text_embeddings": pe},
        )
    )(
        params,
        jax.random.PRNGKey(2),
        ctx["text_embeddings"],
        ctx["pooled_text_embeddings"],
    )
    assert np.isfinite(float(loss))

    samples = model.sample(
        params,
        jax.random.PRNGKey(3),
        num_samples=2,
        context={"text_prompts": ["one", "two"]},
        num_sampling_steps=4,
    )
    assert samples.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(samples)))


def test_fid_harness():
    from xdiffusion_tpu.eval.fid import compute_fid, train_feature_extractor

    rng = np.random.default_rng(0)
    # "Real": digit-like blobs; same distribution twice -> small FID;
    # noise -> large FID.
    from xdiffusion_tpu.datasets.synthetic import generate_digits

    imgs, labels = generate_digits(512, seed=0)
    imgs = imgs.astype(np.float32) / 255.0
    imgs2, _ = generate_digits(512, seed=9)
    imgs2 = imgs2.astype(np.float32) / 255.0
    noise = rng.uniform(size=imgs.shape).astype(np.float32)

    model, params, loss = train_feature_extractor(imgs, labels, steps=200)
    assert loss < 1.5  # classifier learns the synthetic digits

    fid_same = compute_fid(imgs, imgs2, extractor=(model, params))
    fid_noise = compute_fid(imgs, noise, extractor=(model, params))
    assert fid_same >= 0
    assert fid_noise > 5 * max(fid_same, 1e-3)
