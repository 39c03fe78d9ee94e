"""Video score-network zoo tests: pseudo-3D, factorized-3D (FDM),
Video-LDM adapters, AnimateDiff motion modules, Sora STDiT."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xdiffusion_tpu.config import DotConfig, get_obj_from_str

from test_video import tiny_video_config


def _video_ctx(frames=4, batch=2):
    return {
        "timestep": jnp.array([0.2] * batch),
        "logsnr_t": jnp.array([1.0] * batch),
        "frame_indices": jnp.tile(jnp.arange(frames)[None], (batch, 1)),
    }


def tiny_wrapper_params(frames=4):
    """Nested score-network params for the image-UNet video wrappers
    (reference animate_diff.yaml / video_ldm.yaml schema:
    `spatial_score_network` + `motion_module`)."""
    return {
        "input_number_of_frames": frames,
        "is_learned_sigma": False,
        "input_channels": 1,
        "input_spatial_size": 8,
        "motion_module": {
            "num_attention_heads": 2,
            "attention_head_dims": 8,
            "num_attention_blocks_per_layer": 1,
            "num_layers": 1,
        },
        "spatial_score_network": {
            "input_channels": 1,
            "output_channels": 1,
            "input_spatial_size": 8,
            "num_features": 16,
            "channel_multipliers": [1, 2],
            "num_resnet_blocks": 1,
            "use_scale_shift_norm": True,
            "resamp_with_conv": False,
            "resblock_updown": False,
            "resnet_block_type": "biggan",
            "dropout": 0.0,
            "is_learned_sigma": False,
            "is_class_conditional": False,
            "num_classes": 10,
            "attention": {
                "attention_resolutions": [4],
                "attention_heads": 2,
                "attention_channels": 8,
                "is_causal": False,
            },
            "conditioning": {
                "signals": ["timestep"],
                "projections": {
                    "timestep": {
                        "target": "xdiffusion.layers.embedding."
                        "InvCosTimestepEmbeddingProjection",
                        "params": {
                            "num_features": 16,
                            "time_embedding_mult": 4,
                            "max_time": 1.0,
                        },
                    }
                },
                "context_transformer_head": [
                    {
                        "target": "xdiffusion.layers.embedding."
                        "RunProjection",
                        "params": {
                            "input_context_key": "logsnr_t",
                            "output_context_key": "timestep_embedding",
                            "projection_key": "timestep",
                        },
                    }
                ],
                "context_transformer_layer": {
                    "target": "xdiffusion.layers.attention."
                    "SpatialCrossAttention",
                    "params": {
                        "context_dim": -1,
                        "heads": 2,
                        "dim_head": 8,
                        "dropout": 0.0,
                    },
                },
            },
        },
    }


@pytest.mark.parametrize(
    "target,identity_at_init",
    [
        ("xdiffusion.score_networks.unet_pseudo3d.Unet", False),
        ("xdiffusion.score_networks.video_ldm.Unet", True),
        ("xdiffusion.score_networks.animate_diff.Unet", True),
    ],
)
def test_video_unet_variants_forward(target, identity_at_init):
    cls = get_obj_from_str(target)
    if "pseudo3d" in target:
        cfg = DotConfig(
            copy.deepcopy(
                tiny_video_config(frames=4).to_dict()["diffusion"][
                    "score_network"
                ]["params"]
            )
        )
    else:
        cfg = DotConfig(tiny_wrapper_params(frames=4))
    net = cls(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 1))
    ctx = _video_ctx()
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    if identity_at_init:
        # The wrappers' temporal modules are alpha=1-gated (and
        # zero-projected): at init the net IS the per-frame image model —
        # constant-in-time input stays constant in time.
        xc = jnp.tile(x[:, :1], (1, 4, 1, 1, 1))
        oc = jax.jit(net.apply)(params, xc, ctx)
        np.testing.assert_allclose(
            np.asarray(oc - oc[:, :1]), 0.0, atol=1e-5
        )


def test_pseudo3d_temporal_conv_identity_init():
    # The pointwise temporal mixers start as the identity (torch dirac_
    # on a kernel-1 Conv1d): the pseudo-3D net at init behaves exactly
    # like its 2D image counterpart (image -> video weight transfer).
    from xdiffusion_tpu.score_networks.unet_pseudo3d import _temporal_mix

    mix = _temporal_mix(8, "t")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4, 8))
    params = mix.init(jax.random.PRNGKey(1), x)
    out = mix.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_video_ldm_blend_starts_at_image_path():
    # alpha starts at 1 (reference Conv3DLayer/TemporalAttentionLayer
    # alpha gates, video_ldm.py:39,97): the temporal path is exactly
    # silenced at init.
    from xdiffusion_tpu.score_networks.video_ldm import (
        Conv3DLayer,
        TemporalAttentionLayer,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 8))  # (B*F,H,W,C)
    conv = Conv3DLayer(out_dim=8, num_frames=4)
    params = conv.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(conv.apply(params, x)), np.asarray(x), atol=1e-6
    )
    attn = TemporalAttentionLayer(num_frames=4, heads=2)
    params = attn.init(jax.random.PRNGKey(2), x, {})
    np.testing.assert_allclose(
        np.asarray(attn.apply(params, x, {})), np.asarray(x), atol=1e-6
    )


def test_sora_stdit_forward():
    cls = get_obj_from_str("xdiffusion.score_networks.sora.Sora")
    cfg = DotConfig(
        {
            "input_spatial_size": 8,
            "input_channels": 1,
            "input_number_of_frames": 4,
            "is_learned_sigma": False,
            "is_class_conditional": False,
            "input_size": [4, 8, 8],
            "input_sq_size": 8,
            "patch_size": [1, 4, 4],
            "hidden_size": 32,
            "depth": 4,
            "num_heads": 2,
            "mlp_ratio": 2.0,
            "class_dropout_prob": 0.0,
            "pred_sigma": False,
            "drop_path": 0.0,
            "caption_channels": 48,
            "model_max_length": 8,
            "qk_norm": True,
        }
    )
    net = cls(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 1))
    ctx = {
        "timestep": jnp.array([0.3, 0.7]),
        "text_embeddings": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 48)),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(2), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fdm_frame_indices_change_attention():
    # Frame-index RPE: changing frame indices must change the temporal
    # attention output (the FDM conditioning mechanism). The output
    # projection is zero-init (block starts as identity), so give it a
    # nonzero kernel before probing.
    from xdiffusion_tpu.layers.attention import TemporalSelfAttention

    attn = TemporalSelfAttention(
        in_channels=8,
        temporal_sequence_length=4,
        max_relative_position=8,
        heads=2,
        dim_head=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 2, 8))
    ctx1 = {"frame_indices": jnp.array([[0, 1, 2, 3]])}
    params = attn.init(jax.random.PRNGKey(1), x, ctx1)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jnp.ones_like(p), params
    )
    out1 = attn.apply(params, x, ctx1)
    out2 = attn.apply(params, x, {"frame_indices": jnp.array([[0, 3, 6, 7]])})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # And without frame_indices it falls back to window positions.
    out3 = attn.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out3), atol=1e-5
    )


def test_partial_restore_transfers_backbone_keeps_motion(tmp_path):
    """Image->video transfer contract (the reference recipe: the
    AnimateDiff spatial tree IS the image UNet): an image-UNet checkpoint
    warm-starts the AnimateDiff net; only motion params stay at init."""
    import numpy as np

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.parallel import create_train_state
    import optax

    params_cfg = tiny_wrapper_params(frames=4)
    base_net = get_obj_from_str("xdiffusion.score_networks.unet.Unet")(
        config=DotConfig(copy.deepcopy(params_cfg["spatial_score_network"]))
    )
    ad_net = get_obj_from_str("xdiffusion.score_networks.animate_diff.Unet")(
        config=DotConfig(copy.deepcopy(params_cfg))
    )
    x = jnp.zeros((1, 4, 8, 8, 1))
    ctx = _video_ctx(batch=1, frames=4)
    base_params = jax.jit(base_net.init)(
        jax.random.PRNGKey(0), x[:, 0], _video_ctx(batch=1)
    )
    # Make the base distinguishable from a fresh init.
    base_params = jax.tree.map(lambda a: a + 0.25, base_params)
    state = create_train_state(base_params, optax.sgd(1e-3))
    checkpoints.save_checkpoint(str(tmp_path / "ckpt"), state, 1)

    ad_params = jax.jit(ad_net.init)(jax.random.PRNGKey(1), x, ctx)
    merged, step, missing = checkpoints.restore_params_partial(
        str(tmp_path / "ckpt"), ad_params
    )
    assert step == 1 and missing
    assert all(
        any(m in path.lower() for m in ("motion", "temporal", "tconv"))
        for path in missing
    )
    # A backbone leaf actually took the checkpointed value.
    from flax.traverse_util import flatten_dict

    flat_m = flatten_dict(merged)
    flat_b = flatten_dict(base_params)
    shared = [k for k in flat_m if k in flat_b]
    assert shared
    k = shared[0]
    np.testing.assert_allclose(
        np.asarray(flat_m[k]), np.asarray(flat_b[k]), atol=1e-6
    )


def _fdm_cfg(frames=4):
    return DotConfig(
        {
            "input_channels": 1,
            "output_channels": 1,
            "input_spatial_size": 8,
            "input_number_of_frames": frames,
            "model_channels": 16,
            "num_res_blocks": 1,
            "attention_resolutions": [4],
            "dropout": 0.0,
            "channel_mult": [1, 2],
            "conv_resample": True,
            "use_scale_shift_norm": True,
            "dims": 2,
            "num_heads": 2,
            "num_heads_upsample": -1,
            "use_rpe_net": True,
            "is_learned_sigma": False,
        }
    )


def test_fdm_factorized_unet_forward_and_rpe():
    """The FDM net is its own architecture (reference
    unet_factorized3d.py:197-478): obs-indicator input channel, per-frame
    time embedding, and frame-index RPE temporal attention."""
    import flax

    cls = get_obj_from_str("xdiffusion.score_networks.unet_factorized3d.UNet")
    net = cls(config=_fdm_cfg())
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 1))
    ctx = {
        "timestep": jnp.array([0.2, 0.7]),
        "frame_indices": jnp.tile(jnp.arange(4)[None], (2, 1)),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x, ctx)
    out = jax.jit(net.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))

    # Perturb away from init: the final conv and RPE outputs are
    # zero-initialized (faithful to the reference), so the sensitivity
    # checks below need non-degenerate parameters.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    out = net.apply(params, x, ctx)

    # RPE network params exist (timestep-conditioned relative positions,
    # reference attention.py:910-938) — visibly different from unet_3d.
    keys = {
        "/".join(map(str, k))
        for k in flax.traverse_util.flatten_dict(params).keys()
    }
    assert any("rpe_k" in k for k in keys)
    assert any("rpe_v" in k for k in keys)
    assert any("temporal_attention" in k for k in keys)
    assert any("spatial_attention" in k for k in keys)

    # Frame indices matter: permuting them changes the output (the RPE
    # terms see real temporal distances, not window positions).
    ctx2 = dict(ctx)
    ctx2["frame_indices"] = jnp.asarray([[0, 7, 21, 40]] * 2)
    out2 = net.apply(params, x, ctx2)
    assert not np.allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_fdm_observed_frames_spliced_and_masked():
    """Observed frames are replaced by x0 at the input and the obs
    indicator channel flags them; observed and latent frames sit in
    separate temporal-attention groups (reference :440-452,1056-1076)."""
    cls = get_obj_from_str("xdiffusion.score_networks.unet_factorized3d.UNet")
    net = cls(config=_fdm_cfg())
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 1))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8, 1))
    mask = jnp.asarray([[1, 1, 0, 0]], dtype=jnp.float32)  # last 2 observed
    ctx = {
        "timestep": jnp.array([0.5]),
        "frame_indices": jnp.arange(4)[None],
        "video_mask": mask,
        "x0": x0,
    }
    params = net.init(jax.random.PRNGKey(2), x, ctx)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    out = net.apply(params, x, ctx)
    # Changing the NOISY values of observed frames must not change
    # anything (they were spliced to x0 at the input).
    x_perturbed = x.at[:, 2:].add(10.0)
    out2 = net.apply(params, x_perturbed, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
    # Changing x0 of observed frames must change latent-frame outputs
    # (conditioning flows through temporal attention... via the spliced
    # input of the observed stream).
    ctx3 = dict(ctx)
    ctx3["x0"] = x0 + 1.0
    out3 = net.apply(params, x, ctx3)
    assert not np.allclose(np.asarray(out), np.asarray(out3), atol=1e-5)


def test_temporal_only_finetuning_freezes_backbone(tmp_path):
    """The Video-LDM/AnimateDiff fine-tuning recipe end-to-end: image
    backbone transferred via partial restore, optimizer masked to the
    temporal/motion params (training/video/train.py
    train_temporal_modules_only) — after a train step the backbone is
    bit-identical and at least one temporal param moved."""
    import numpy as np
    import optax
    from flax.traverse_util import flatten_dict, unflatten_dict

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.parallel import create_train_state, make_train_step

    # Donor: an image-UNet checkpoint (the reference transfer source).
    wrapper_params = tiny_wrapper_params(frames=4)
    donor_net = get_obj_from_str("xdiffusion.score_networks.unet.Unet")(
        config=DotConfig(
            copy.deepcopy(wrapper_params["spatial_score_network"])
        )
    )
    donor_params = jax.jit(donor_net.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 1)),
        _video_ctx(batch=1),
    )
    state0 = create_train_state(donor_params, optax.sgd(1e-2))
    checkpoints.save_checkpoint(str(tmp_path / "ckpt"), state0, 1)

    # Recipient: AnimateDiff net wrapping the same spatial config.
    ad_cfg_dict = copy.deepcopy(tiny_video_config(frames=4).to_dict())
    ad_cfg_dict["diffusion"]["score_network"] = {
        "target": "xdiffusion.score_networks.animate_diff.Unet",
        "params": wrapper_params,
    }
    model = GaussianDiffusion_DDPM(DotConfig(ad_cfg_dict))
    params = model.init_params(jax.random.PRNGKey(1))
    merged, _, missing = checkpoints.restore_params_partial(
        str(tmp_path / "ckpt"), params
    )
    assert missing

    missing_set = set(missing)

    def labels(tree):
        flat = flatten_dict(tree)
        return unflatten_dict(
            {
                p: (
                    "train"
                    if "/".join(str(k) for k in p) in missing_set
                    else "freeze"
                )
                for p in flat
            }
        )

    tx = optax.multi_transform(
        {"train": optax.sgd(1e-1), "freeze": optax.set_to_zero()}, labels
    )
    # Snapshot before the step: make_train_step donates the state buffers.
    snapshot = jax.tree.map(lambda a: np.array(a), merged)
    state = create_train_state(merged, tx)
    step = make_train_step(model, tx)

    videos = np.random.default_rng(0).uniform(size=(2, 4, 8, 8, 1)).astype(
        np.float32
    )
    state, metrics = step(state, {"images": videos}, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))

    flat_before = flatten_dict(snapshot)
    flat_after = flatten_dict(state.params)
    moved = 0
    for path, before in flat_before.items():
        name = "/".join(str(k) for k in path)
        after = flat_after[path]
        if name in missing_set:
            moved += int(not np.allclose(np.asarray(before), np.asarray(after)))
        else:
            # Frozen backbone: bit-identical.
            np.testing.assert_array_equal(
                np.asarray(before), np.asarray(after), err_msg=name
            )
    assert moved > 0


def test_fdm_training_batch_sampler():
    """sample_fdm_training_batch follows the reference scheme
    (training_utils.py:14-113): per-example random latent/observed frame
    subsets, gathered frames match their source indices, masks are
    disjoint, and every example has at least one latent frame."""
    import numpy as np

    from xdiffusion_tpu.training_utils import sample_fdm_training_batch

    rng = np.random.default_rng(0)
    videos = rng.uniform(size=(6, 16, 4, 4, 1)).astype(np.float32)

    v, fi, obs, lat = sample_fdm_training_batch(videos, 16, "random", rng=rng)
    assert v.shape == videos.shape and fi.shape == (6, 16)
    assert obs.shape == (6, 16) and lat.shape == (6, 16)
    # Gathered frames really come from the indicated source indices.
    for b in range(6):
        np.testing.assert_array_equal(v[b], videos[b][fi[b]])
    # Disjoint masks; at least one latent frame per example.
    assert np.all(obs * lat == 0)
    assert np.all(lat.sum(axis=1) >= 1)
    assert np.all((fi >= 0) & (fi < 16))

    v, fi, obs, lat = sample_fdm_training_batch(videos, 16, "uniform", rng=rng)
    np.testing.assert_array_equal(v, videos)
    np.testing.assert_array_equal(lat, np.ones((6, 16)))
    np.testing.assert_array_equal(obs, np.zeros((6, 16)))


def test_fdm_loss_provides_x0_for_observed_frames():
    """With a video_mask, loss_on_batch exposes the clean frames as
    context['x0'] so input-splicing networks (FDM) condition on real
    frames, not zeros; gradients differ when observed frames change."""
    import numpy as np

    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM

    model = GaussianDiffusion_DDPM(tiny_video_config(frames=4))
    params = model.init_params(jax.random.PRNGKey(0))
    videos = np.random.default_rng(0).uniform(size=(2, 4, 8, 8, 1)).astype(
        np.float32
    )
    mask = jnp.asarray([[True, True, True, False], [True, True, False, False]])
    loss1, _ = model.loss_on_batch(
        params, jax.random.PRNGKey(1), jnp.asarray(videos),
        {"video_mask": mask},
    )
    # Perturb ONLY observed (conditioning) frames -> the loss must move,
    # proving the clean frames reach the conditioning path.
    videos2 = videos.copy()
    videos2[0, 3] = 1.0 - videos2[0, 3]
    videos2[1, 2:] = 1.0 - videos2[1, 2:]
    loss2, _ = model.loss_on_batch(
        params, jax.random.PRNGKey(1), jnp.asarray(videos2),
        {"video_mask": mask},
    )
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert abs(float(loss1) - float(loss2)) > 1e-8


def _sora_cfg():
    return DotConfig(
        {
            "input_spatial_size": 8,
            "input_channels": 1,
            "input_number_of_frames": 4,
            "is_learned_sigma": False,
            "is_class_conditional": False,
            "input_size": [4, 8, 8],
            "input_sq_size": 8,
            "patch_size": [1, 4, 4],
            "hidden_size": 32,
            "depth": 2,
            "num_heads": 2,
            "mlp_ratio": 2.0,
            "class_dropout_prob": 0.0,
            "pred_sigma": False,
            "drop_path": 0.0,
            "caption_channels": 48,
            "model_max_length": 8,
            "qk_norm": True,
        }
    )


def test_sora_stdit3_structure_and_x_mask():
    """STDiT3 fidelity (reference sora.py:26-465): depth PAIRS of
    spatial+temporal blocks with per-block scale_shift_table and a shared
    t_block; the temporal conditioning mask modulates conditioned frames
    with the timestep-ZERO embedding."""
    import numpy as np

    cls = get_obj_from_str("xdiffusion.score_networks.sora.Sora")
    net = cls(config=_sora_cfg())
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 1))
    ctx = {
        "timestep": jnp.array([0.3, 0.7]),
        "text_embeddings": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 48)),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(2), x, ctx)
    top = params["params"]
    # Paired blocks + table/shared-t_block structure.
    for i in range(2):
        assert f"spatial_{i}" in top and f"temporal_{i}" in top
        assert "scale_shift_table" in top[f"spatial_{i}"]
    assert "t_block" in top and "final_scale_shift_table" in top

    # Zero-init output heads make every output 0 at init; perturb so the
    # sensitivity assertions are meaningful.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [
        l + 0.05 * jax.random.normal(jax.random.PRNGKey(100 + i), l.shape)
        for i, l in enumerate(leaves)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    out_plain = net.apply(params, x, ctx)

    # All-True mask (every frame generated) == no mask at all.
    ctx_all = dict(ctx)
    ctx_all["video_mask"] = jnp.ones((2, 4), dtype=bool)
    np.testing.assert_allclose(
        np.asarray(net.apply(params, x, ctx_all)),
        np.asarray(out_plain),
        atol=1e-5,
    )

    # All-False mask (every frame conditioned): every BLOCK modulation
    # runs through the t0 embedding, but exact timestep invariance does
    # NOT hold — the reference T2IFinalLayer reassigns `x` before its
    # zero branch (layers/sora.py:466-471), leaking the t-modulated
    # tokens into conditioned frames; we reproduce that quirk for
    # imported-weights parity. Assert the t0 path engages (differs from
    # the unmasked forward) rather than invariance.
    ctx_f1 = dict(ctx)
    ctx_f1["video_mask"] = jnp.zeros((2, 4), dtype=bool)
    assert not np.allclose(
        np.asarray(net.apply(params, x, ctx_f1)), np.asarray(out_plain)
    )

    # Mixed mask actually differs from no-mask (t0 path engaged).
    ctx_mix = {**ctx, "video_mask": jnp.asarray([[True, False, True, False]] * 2)}
    assert not np.allclose(
        np.asarray(net.apply(params, x, ctx_mix)), np.asarray(out_plain)
    )

    # Text attention mask: masking out pad tokens changes the output vs
    # attending to them.
    ctx_tm = {**ctx, "text_attention_mask": jnp.asarray([[1] * 4 + [0] * 4] * 2)}
    assert not np.allclose(
        np.asarray(net.apply(params, x, ctx_tm)), np.asarray(out_plain)
    )
