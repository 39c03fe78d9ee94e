"""Parity tests for the frozen text-encoder towers.

HF's torch CLIPTextModel / T5EncoderModel are instantiated from tiny
configs (random init, fully offline), their state_dicts imported into
our flax towers, and outputs compared — validating both the
architectures and the weight importers. With real cached weights the
same code path loads openai/clip-vit-large-patch14 etc.
(reference usage: layers/clip.py:18, layers/embedding.py:511-600).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_clip_text_tower_matches_hf():
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel

    from xdiffusion_tpu.layers.text_encoders import (
        CLIPTextConfig,
        CLIPTextTransformer,
        import_hf_clip_text,
    )

    hf_cfg = HFCLIPTextConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        eos_token_id=98,
        bos_token_id=97,
        pad_token_id=0,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        eos_token_id=98,
        hidden_act="quick_gelu",
    )
    model = CLIPTextTransformer(cfg)
    ids = np.array(
        [[97, 5, 6, 7, 98, 0, 0, 0], [97, 11, 12, 98, 0, 0, 0, 0]],
        dtype=np.int32,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params = import_hf_clip_text(
        params, {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    )

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)))
    hidden, pooled = model.apply(params, jnp.asarray(ids))

    np.testing.assert_allclose(
        np.asarray(hidden), ref.last_hidden_state.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pooled), ref.pooler_output.numpy(), atol=1e-5
    )


@pytest.mark.parametrize("ff_proj", ["relu", "gated-gelu"])
def test_t5_encoder_matches_hf(ff_proj):
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from xdiffusion_tpu.layers.text_encoders import (
        T5Config,
        T5Encoder,
        import_hf_t5_encoder,
    )

    hf_cfg = HFT5Config(
        vocab_size=120,
        d_model=32,
        d_kv=8,
        d_ff=48,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj=ff_proj,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    cfg = T5Config(
        vocab_size=120,
        d_model=32,
        d_kv=8,
        d_ff=48,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj=ff_proj,
    )
    model = T5Encoder(cfg)
    ids = np.array(
        [[3, 5, 6, 7, 1, 0, 0, 0], [9, 11, 12, 1, 0, 0, 0, 0]], dtype=np.int32
    )
    mask = (ids != 0).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params = import_hf_t5_encoder(
        params, {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    )

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    ours = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))

    # Compare only unmasked positions: HF zeroes nothing, but masked
    # positions see different key sets... both mask identically, so all
    # positions should match.
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_sd3_triple_encoder_conditioning_matches_reference_recipe():
    """SD3 joint conditioning end to end (reference context.py:284-345):
    two tiny HF CLIPTextModelWithProjection towers + a tiny T5 encoder are
    imported into our flax towers, composed by SD3EncoderStack, and the
    result compared against the reference recipe computed directly with
    the torch models — penultimate CLIP hiddens concat channel-wise,
    zero-pad to the T5 width, sequence-concat with T5, pooled = concat of
    the two projected CLIP embeds."""
    from transformers import (
        CLIPTextConfig as HFCLIPTextConfig,
        CLIPTextModelWithProjection,
        T5Config as HFT5Config,
        T5EncoderModel,
    )

    from xdiffusion_tpu.context import SD3EncoderStack, SD3TextPromptsPreprocessor
    from xdiffusion_tpu.layers.text_encoders import (
        CLIPTextConfig,
        CLIPTextTransformer,
        T5Config,
        T5Encoder,
        import_hf_clip_text,
        import_hf_t5_encoder,
    )

    torch.manual_seed(0)

    def mk_clip(hidden, inter, heads, proj):
        hf_cfg = HFCLIPTextConfig(
            vocab_size=99, hidden_size=hidden, intermediate_size=inter,
            num_hidden_layers=3, num_attention_heads=heads,
            max_position_embeddings=16, eos_token_id=98, bos_token_id=97,
            pad_token_id=0, hidden_act="quick_gelu", projection_dim=proj,
        )
        hf = CLIPTextModelWithProjection(hf_cfg).eval()
        cfg = CLIPTextConfig(
            vocab_size=99, hidden_size=hidden, intermediate_size=inter,
            num_hidden_layers=3, num_attention_heads=heads,
            max_position_embeddings=16, eos_token_id=98,
            hidden_act="quick_gelu", projection_dim=proj,
        )
        mod = CLIPTextTransformer(cfg)
        params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
        params = import_hf_clip_text(
            params, {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        )
        return hf, mod, params

    hf1, mod1, p1 = mk_clip(32, 64, 4, 24)
    hf2, mod2, p2 = mk_clip(48, 96, 4, 40)

    hf_t5_cfg = HFT5Config(
        vocab_size=120, d_model=96, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="relu",
        dropout_rate=0.0,
    )
    hf_t5 = T5EncoderModel(hf_t5_cfg).eval()
    t5_cfg = T5Config(
        vocab_size=120, d_model=96, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="relu",
    )
    t5_mod = T5Encoder(t5_cfg)
    t5_params = t5_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    t5_params = import_hf_t5_encoder(
        t5_params, {k: v.detach().numpy() for k, v in hf_t5.state_dict().items()}
    )

    # Deterministic stub tokenizers (prompt -> fixed ids); B=2 prompts.
    clip_ids = np.array(
        [[97, 5, 6, 98, 0, 0], [97, 11, 12, 13, 98, 0]], dtype=np.int32
    )
    t5_ids = np.array(
        [[3, 5, 6, 7, 1, 0, 0, 0], [9, 11, 12, 1, 0, 0, 0, 0]], dtype=np.int32
    )
    stack = SD3EncoderStack(
        (mod1, p1, lambda prompts, L: clip_ids[:, :L]),
        (mod2, p2, lambda prompts, L: clip_ids[:, :L]),
        (t5_mod, t5_params, lambda prompts, L: t5_ids[:, :L]),
        clip1_len=6, clip2_len=6, t5_len=8,
    )
    seq, pooled = stack(["a", "b"])

    # Expected, straight from the torch towers per the reference recipe.
    with torch.no_grad():
        o1 = hf1(
            input_ids=torch.from_numpy(clip_ids.astype(np.int64)),
            output_hidden_states=True,
        )
        o2 = hf2(
            input_ids=torch.from_numpy(clip_ids.astype(np.int64)),
            output_hidden_states=True,
        )
        t5_out = hf_t5(
            input_ids=torch.from_numpy(t5_ids.astype(np.int64))
        ).last_hidden_state
        clip_seq = torch.cat([o1.hidden_states[-2], o2.hidden_states[-2]], -1)
        d = t5_out.shape[-1] - clip_seq.shape[-1]
        if d > 0:
            clip_seq = torch.nn.functional.pad(clip_seq, (0, d))
        elif d < 0:
            t5_out = torch.nn.functional.pad(t5_out, (0, -d))
        want_seq = torch.cat([clip_seq, t5_out], dim=-2).numpy()
        want_pooled = torch.cat([o1.text_embeds, o2.text_embeds], -1).numpy()

    np.testing.assert_allclose(seq, want_seq, atol=2e-5)
    np.testing.assert_allclose(pooled, want_pooled, atol=2e-5)

    # And through the preprocessor contract: injected stack, prompts in ->
    # embeddings out, prompts consumed.
    pre = SD3TextPromptsPreprocessor(encoders=stack)
    ctx = pre({"text_prompts": ["a", "b"]})
    assert "text_prompts" not in ctx
    np.testing.assert_allclose(np.asarray(ctx["text_embeddings"]), want_seq, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ctx["pooled_text_embeddings"]), want_pooled, atol=2e-5
    )
