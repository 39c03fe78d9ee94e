"""Reference-API compatibility shims: every class the reference configs
name must not just resolve but behave (forward-run contracts)."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import get_obj_from_str


def test_clip_prompts_preprocessor_tokenizes():
    cls = get_obj_from_str("xdiffusion.context.CLIPTextPromptsPreprocessor")
    prep = cls(text_sequence_length=16)
    ctx = prep({"text_prompts": ["three", "eight"]})
    assert ctx["text_tokens"].shape == (2, 16)
    assert "text_prompts" not in ctx


def test_unconditional_embedding_adapter_zeroes():
    cls = get_obj_from_str("xdiffusion.context.UnconditionalEmbeddingAdapter")
    adapter = cls(embedding_shape=[4, 8])
    ctx = {"text_embeddings": jnp.ones((2, 4, 8))}
    out = adapter(ctx)
    assert float(jnp.abs(out["text_embeddings"]).max()) == 0.0


def test_clip_token_projection_forward():
    cls = get_obj_from_str(
        "xdiffusion.layers.embedding.CLIPTextTokenProjection"
    )
    proj = cls(text_sequence_length=8, width=32)
    tokens = jnp.zeros((2, 8), jnp.int32)
    params = proj.init(jax.random.PRNGKey(0), tokens)
    out = proj.apply(params, tokens)
    assert out.shape == (2, 8, 32)


def test_sana_prompt_embedder_contract():
    cls = get_obj_from_str(
        "xdiffusion.layers.embedding.SanaPromptToTextEmbedding"
    )
    emb = cls(max_length=12, embedding_dim=16)
    ctx = emb({"text_prompts": ["one", "two"]})
    assert ctx["text_embeddings"].shape == (2, 12, 16)


def test_spatial_transformer_forward_and_cross_attention():
    cls = get_obj_from_str("xdiffusion.layers.transformer.SpatialTransformer")
    net = cls(
        in_channels=8, num_layers=1, attention_heads=2,
        attention_channels=8, context_dim=12,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    ctx = {"text_embeddings": jax.random.normal(jax.random.PRNGKey(1), (2, 5, 12))}
    params = net.init(jax.random.PRNGKey(2), x, ctx)
    out = net.apply(params, x, ctx)
    assert out.shape == x.shape
    # Zero-init out-projection: identity at init.
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
    # Context must influence the output once the out-projection is live.
    params2 = jax.tree.map(
        lambda a: a + 0.05 if a.ndim >= 2 else a, params
    )
    o1 = net.apply(params2, x, ctx)
    ctx2 = {"text_embeddings": ctx["text_embeddings"] + 1.0}
    o2 = net.apply(params2, x, ctx2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_down_avg_pool_and_sequence_alias():
    cls = get_obj_from_str("xdiffusion.layers.pool.DownAvgPool")
    pool = cls(stride=2)
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 8, 2)
    out = pool.init_with_output(jax.random.PRNGKey(0), x)[0]
    assert out.shape == (1, 4, 2)
    srb = get_obj_from_str("xdiffusion.layers.sequence.SequenceResidualBlock")
    from xdiffusion_tpu.layers.s4d import SequenceResidualBlock

    assert srb is SequenceResidualBlock


def test_temporal_convolution_identity_init():
    cls = get_obj_from_str("xdiffusion.layers.utils.TemporalConvolution")
    conv = cls(kernel_size=3, padding=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 2, 4))
    params = conv.init(jax.random.PRNGKey(1), x)
    out = conv.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_hunyuan_text_encoder_and_rope_heads():
    enc_cls = get_obj_from_str(
        "xdiffusion.layers.hunyuan_video.text_encoder.TextEncoder"
    )
    llm = enc_cls(text_encoder_type="llava_llm", max_length=6,
                  embedding_dim=16)
    clip = enc_cls(text_encoder_type="clipL", embedding_dim=8,
                   context_output_key="hv_clip_embeddings")
    ctx = {"text_prompts": ["a", "b"]}
    ctx = llm(ctx)
    ctx = clip(ctx)
    assert ctx["text_embeddings"].shape == (2, 6, 16)
    assert ctx["hv_clip_embeddings"].shape == (2, 8)

    rope_cls = get_obj_from_str(
        "xdiffusion.layers.hunyuan_video.embedding.RopeFrequencies"
    )
    rope = rope_cls(video_length=4, height=8, width=8,
                    patch_size=[1, 2, 2], rope_dim_list=[4, 6, 6])
    ctx = rope(ctx)
    cos_sin = ctx["rope_frequencies"]
    assert cos_sin.shape == (2, 1, 4 * 4 * 4, 8)  # (cos/sin, B, L, sum/2)


def test_autoencoder_aliases_resolve_to_shared_impls():
    lpaps = get_obj_from_str(
        "xdiffusion.autoencoders.contperceptual.LPAPSWithDiscriminator"
    )
    from xdiffusion_tpu.autoencoders.losses import LPIPSWithDiscriminator

    assert lpaps is LPIPSWithDiscriminator
    auto = get_obj_from_str(
        "xdiffusion.autoencoders.opensora.hunyuan."
        "autoencoder_kl_causal_3d.AutoencoderKLCausal3D"
    )
    assert auto is not None


def test_score_network_name_aliases():
    for ref, mine in [
        ("xdiffusion.score_networks.animate_diff.AnimateDiffUnet",
         "xdiffusion.score_networks.animate_diff.Unet"),
        ("xdiffusion.score_networks.unet_factorized3d.UNet",
         "xdiffusion.score_networks.unet_factorized3d.Unet"),
        ("xdiffusion.score_networks.video_ldm.VideoLDMUnet",
         "xdiffusion.score_networks.video_ldm.Unet"),
    ]:
        assert get_obj_from_str(ref) is get_obj_from_str(mine)


def test_image_diffusion_prefix_resolves():
    # The reference's older package name appears in a few of its configs.
    obj = get_obj_from_str(
        "image_diffusion.layers.embedding.T5TextTokensToEmbedding"
    )
    from xdiffusion_tpu.layers.embedding import T5TextTokensToEmbedding

    assert obj is T5TextTokensToEmbedding
