"""Video diffusion tests: masking, batch prep, 3D UNet, masked training,
conditioned sampling, autoregressive schemes."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.datasets.moving_mnist import (
    MovingMNIST,
    synthesize_moving_mnist,
)
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
from xdiffusion_tpu.masking import IdentityMaskGenerator, OpenSoraMaskGenerator
from xdiffusion_tpu.samplers.schemes import Autoregressive
from xdiffusion_tpu.training_utils import (
    fdm_random_mask,
    get_training_batch,
    preprocess_training_videos,
)


def tiny_video_config(frames=4):
    return DotConfig(
        {
            "diffusion": {
                "parameterization": "v",
                "sampling": {
                    "output_channels": 1,
                    "output_spatial_size": 8,
                    "output_frames": frames,
                    "target": "xdiffusion.samplers.ancestral.AncestralSampler",
                    "params": {},
                },
                "noise_scheduler": {
                    "target": "xdiffusion.scheduler.ContinuousNoiseScheduler",
                    "params": {
                        "num_scales": 64,
                        "logsnr_schedule": "cosine",
                        "loss_type": "l2",
                        "logsnr_min": -20,
                        "logsnr_max": 20,
                    },
                },
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
                    "target": "xdiffusion.score_networks.unet_3d.Unet",
                    "params": {
                        "input_channels": 1,
                        "output_channels": 1,
                        "input_spatial_size": 8,
                        "input_number_of_frames": frames,
                        "num_features": 16,
                        "channel_multipliers": [1, 2],
                        "attention_resolutions": [4],
                        "num_resnet_blocks": 1,
                        "use_scale_shift_norm": True,
                        "resamp_with_conv": False,
                        "resblock_updown": False,
                        "resnet_block_type": "biggan",
                        "dropout": 0.0,
                        "mlp_layers": 2,
                        "is_learned_sigma": False,
                        "is_class_conditional": False,
                        "num_classes": 10,
                        "conditioning": {
                            "signals": ["timestep"],
                            "projections": {
                                "timestep": {
                                    "target": "xdiffusion.layers.embedding.InvCosTimestepEmbeddingProjection",
                                    "params": {
                                        "num_features": 16,
                                        "time_embedding_mult": 4,
                                        "max_time": 1.0,
                                    },
                                }
                            },
                            "context_transformer_head": [
                                {
                                    "target": "xdiffusion.layers.embedding.RunProjection",
                                    "params": {
                                        "input_context_key": "logsnr_t",
                                        "output_context_key": "timestep_embedding",
                                        "projection_key": "timestep",
                                    },
                                }
                            ],
                            "spatial_context_transformer_layer": {
                                "target": "xdiffusion.layers.attention.SpatialCrossAttention",
                                "params": {
                                    "context_dim": -1,
                                    "heads": 2,
                                    "dim_head": 8,
                                    "dropout": 0.0,
                                },
                            },
                            "temporal_context_transformer_layer": {
                                "target": "xdiffusion.layers.attention.TemporalSelfAttention",
                                "params": {
                                    "context_dim": -1,
                                    "heads": 2,
                                    "dim_head": 8,
                                    "temporal_sequence_length": frames,
                                    "max_relative_position": frames,
                                    "dropout": 0.0,
                                },
                            },
                        },
                    },
                },
            },
            "data": {
                "image_size": 8,
                "num_channels": 1,
                "num_classes": 10,
                "input_number_of_frames": frames,
            },
        }
    )


def test_mask_generators():
    ident = IdentityMaskGenerator()
    m = ident.get_masks((4, 8))
    assert m.shape == (4, 8) and m.all()

    gen = OpenSoraMaskGenerator(
        {"quarter_random": 0.3, "interpolate": 0.3, "random": 0.2}
    )
    rng = np.random.default_rng(0)
    masks = gen.get_masks((64, 8), rng=rng)
    assert masks.shape == (64, 8)
    assert masks.any(axis=1).all()  # never fully conditioned
    assert not masks.all()  # some conditioning happened across the batch


def test_fdm_mask_and_batch_prep():
    masks = fdm_random_mask(32, 8, rng=np.random.default_rng(0))
    assert masks.shape == (32, 8)
    assert masks.any(axis=1).all()

    videos = np.random.default_rng(1).uniform(size=(4, 10, 16, 16, 1)).astype(
        np.float32
    )
    cfg = tiny_video_config(frames=4)
    out, ctx = preprocess_training_videos(
        videos, cfg, mask_generator=IdentityMaskGenerator(),
        rng=np.random.default_rng(2),
    )
    assert out.shape == (4, 4, 8, 8, 1)
    assert ctx["frame_indices"].shape == (4, 4)
    assert ctx["video_mask"].shape == (4, 4)

    image_batch = get_training_batch(out, is_image_batch=True)
    assert image_batch.shape == (4, 1, 8, 8, 1)


def test_moving_mnist_synthesis():
    videos, labels = synthesize_moving_mnist(3, num_frames=5, image_size=32)
    assert videos.shape == (3, 5, 32, 32, 1)
    assert videos.dtype == np.uint8
    # Motion: consecutive frames differ.
    assert (videos[:, 0] != videos[:, 1]).any()
    ds = MovingMNIST(split="train", image_size=32, num_frames=4, num_videos=4)
    v, l = ds[0]
    assert v.shape == (4, 32, 32, 1) and v.max() <= 1.0


def test_video_unet_train_and_masked_sampling():
    model = GaussianDiffusion_DDPM(tiny_video_config(frames=4))
    params = model.init_params(jax.random.PRNGKey(0))
    videos = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 8, 8, 1))
    mask = jnp.asarray(
        np.array([[False, True, True, True], [True, True, True, True]])
    )

    loss, _ = jax.jit(
        lambda p, r: model.loss_on_batch(
            p, r, videos, {"video_mask": mask}
        )
    )(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))

    # Conditioned sampling: observed frame 0 of example 0 must be pinned.
    x0 = jnp.zeros((2, 4, 8, 8, 1)) + 0.25  # normalized-space conditioning
    samples = model.sample(
        params,
        jax.random.PRNGKey(3),
        num_samples=2,
        context={"video_mask": mask, "x0": x0},
        num_sampling_steps=4,
    )
    assert samples.shape == (2, 4, 8, 8, 1)
    s = np.asarray(samples)
    assert np.all(np.isfinite(s))
    # Pinned frame: x0=0.25 in model space -> unnormalized (0.25+1)/2 = 0.625.
    np.testing.assert_allclose(s[0, 0], 0.625, atol=1e-5)


def test_autoregressive_scheme_covers_video():
    scheme = Autoregressive(
        video_length=20, num_observed_frames=0, max_frames=8, step_size=4
    )
    windows = list(scheme)
    # First window unconditional, later windows conditioned.
    obs0, lat0, mask0 = windows[0]
    assert obs0 == [] and lat0 == list(range(8))
    assert mask0.all()
    obs1, lat1, mask1 = windows[1]
    assert len(obs1) == 4 and lat1[0] == 8
    assert (~mask1[0][:4]).all() and mask1[0][4:].all()
    assert scheme.is_done()


def test_prefetch_and_native_batch_assembly():
    """The prefetch wrapper yields identical batches to the raw iterator,
    and the native (C++) gather+normalize matches numpy exactly."""
    import numpy as np

    from xdiffusion_tpu.datasets.utils import prefetch
    from xdiffusion_tpu.native import gather_normalize

    arena = np.random.default_rng(0).integers(
        0, 256, size=(50, 4, 4, 1)
    ).astype(np.uint8)
    idx = np.array([0, 49, 7, 7])
    got = gather_normalize(arena, idx)
    want = arena[idx].astype(np.float32) * np.float32(1.0 / 255.0)
    np.testing.assert_array_equal(got, want)

    def src():
        for i in range(7):
            yield {"i": np.full((2,), i)}

    out = [b["i"][0] for _, b in zip(range(7), prefetch(src()))]
    assert out == list(range(7))

    # Producer exceptions surface to the consumer.
    def bad():
        yield {"i": np.zeros(1)}
        raise ValueError("boom")

    it = prefetch(bad())
    next(it)
    import pytest

    with pytest.raises(ValueError):
        next(it)
