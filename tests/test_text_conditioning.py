"""Text conditioning tests: BPE tokenizer, GLIDE transformer head,
cross-attention over context embeddings, CFG with empty prompts."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.context import TextPromptsPreprocessor
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
from xdiffusion_tpu.tokenizer import get_encoder

from test_diffusion import tiny_config


def glide_config():
    cfg = copy.deepcopy(tiny_config(cfg_prob=0.2).to_dict())
    diff = cfg["diffusion"]
    diff["context_preprocessing"] = [
        {
            "target": "xdiffusion.context.TextPromptsPreprocessor",
            "params": {"text_context_size": 16},
        }
    ]
    diff["classifier_free_guidance"] = {
        "classifier_free_guidance": 1.0,
        "unconditional_guidance_probability": 0.2,
        "signals": ["text_tokens"],
        "unconditional_context": {
            "target": "xdiffusion.context.UnconditionalTextPromptsAdapter",
            "params": {},
        },
    }
    sn = diff["score_network"]["params"]
    sn["conditioning"]["signals"] = ["text_tokens", "timestep"]
    sn["conditioning"]["projections"]["text_tokens"] = {
        "target": "xdiffusion.layers.embedding.TextTokenProjection",
        "params": {"token_vocabulary_size": 50257, "width": 32},
    }
    sn["conditioning"]["context_transformer_head"].append(
        {
            "target": "xdiffusion.layers.transformer.GLIDETransformerWrapper",
            "params": {
                "context_dim": 32,
                "width": 32,
                "layers": 2,
                "heads": 1,
                "final_layer_norm": True,
                "output_projection_dimension": 64,  # num_features * 4
            },
        }
    )
    sn["conditioning"]["context_transformer_layer"]["params"] = {
        "context_dim": 32,
        "heads": 2,
        "dim_head": 16,
        "dropout": 0.0,
        "context_adapter": {
            "target": "xdiffusion.context.ContextEmbeddingAdapter",
            "params": {},
        },
    }
    return DotConfig(cfg)


def test_tokenizer_roundtrip_and_padding():
    enc = get_encoder()
    tokens = enc.tokenize(["three", "8"], context_length=16)
    assert tokens.shape == (2, 16)
    assert tokens.dtype == np.int32
    # Deterministic + distinct prompts -> distinct ids.
    tokens2 = enc.tokenize(["three", "8"], context_length=16)
    np.testing.assert_array_equal(tokens, tokens2)
    assert not np.array_equal(tokens[0], tokens[1])
    # Roundtrip through decode (byte-level fallback is lossless).
    ids = enc.encode("digit 5")
    assert enc.decode(ids) == "digit 5"


def test_prompts_preprocessor():
    prep = TextPromptsPreprocessor(text_context_size=8)
    ctx = prep({"text_prompts": ["one", "two"]})
    assert "text_tokens" in ctx and "text_prompts" not in ctx
    assert ctx["text_tokens"].shape == (2, 8)


def test_glide_text_conditioned_loss_and_guided_sampling():
    model = GaussianDiffusion_DDPM(glide_config())
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1))

    # Host-side preprocessing resolves prompts to tokens before jit.
    ctx = model.preprocess_context({"text_prompts": ["three", "seven"]})
    assert "text_tokens" in ctx

    loss, _ = jax.jit(
        lambda p, r, tokens: model.loss_on_batch(
            p, r, images, {"text_tokens": tokens}
        )
    )(params, jax.random.PRNGKey(2), ctx["text_tokens"])
    assert np.isfinite(float(loss))

    samples = model.sample(
        params,
        jax.random.PRNGKey(3),
        num_samples=2,
        context={"text_prompts": ["three", "seven"]},
        classifier_free_guidance=2.0,
        num_sampling_steps=4,
    )
    assert samples.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(samples)))
