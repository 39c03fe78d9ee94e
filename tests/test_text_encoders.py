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
