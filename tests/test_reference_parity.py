"""Golden-value parity against the reference implementation.

These tests import the reference package READ-ONLY from /root/reference
(PyTorch, CPU) to produce golden arrays — forward-process schedule tables,
posterior coefficients, EDM preconditioner coefficients — and assert our
schedulers reproduce them numerically. They skip cleanly when the
reference tree isn't mounted or its imports fail.
"""

import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"


def _stub(name):
    mod = types.ModuleType(name)
    mod.__path__ = []
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference package with its audio/vision-only deps
    stubbed (they're unused by the schedule math)."""
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not mounted")
    for name in ("soundfile", "librosa", "accelerate", "einops_exts",
                 "lpips"):
        try:
            __import__(name)
        except Exception:
            _stub(name)
    try:
        import torchvision.transforms  # noqa: F401
    except Exception:
        tv = _stub("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.v2 = types.SimpleNamespace()
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.v2"] = types.ModuleType("v2")
        tv.transforms = tr
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        import xdiffusion.scheduler as ref_sched
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return ref_sched


_IMPORTANCE = {
    "target": "xdiffusion.importance_sampling.UniformSampler",
    "params": {"num_timesteps": 1000},
}


@pytest.mark.parametrize("schedule", ["linear", "cosine"])
def test_discrete_schedule_tables_match(ref, schedule):
    golden = ref.DiscreteNoiseScheduler(
        schedule_type=schedule, num_scales=1000, loss_type="l2",
        importance_sampler=_IMPORTANCE,
    )
    from xdiffusion_tpu.scheduler import DiscreteNoiseScheduler

    ours = DiscreteNoiseScheduler.create(schedule, 1000)
    for ref_attr, our_attr in [
        ("betas", "betas"),
        ("alphas_cumprod", "alphas_cumprod"),
        ("sqrt_alphas_cumprod", "sqrt_alphas_cumprod"),
        ("sqrt_one_minus_alphas_cumprod", "sqrt_one_minus_alphas_cumprod"),
    ]:
        g = np.asarray(getattr(golden, ref_attr).detach().cpu())
        o = np.asarray(getattr(ours, our_attr))
        assert g.shape == o.shape, (ref_attr, g.shape, o.shape)
        np.testing.assert_allclose(
            o, g, rtol=2e-5, atol=2e-6,
            err_msg=f"{schedule}/{ref_attr} diverges from the reference",
        )


def test_posterior_coefficients_match(ref):
    golden = ref.DiscreteNoiseScheduler(
        schedule_type="cosine", num_scales=1000, loss_type="l2",
        importance_sampler=_IMPORTANCE,
    )
    from xdiffusion_tpu.scheduler import DiscreteNoiseScheduler

    ours = DiscreteNoiseScheduler.create("cosine", 1000)
    for attr in ("posterior_variance", "posterior_mean_coef1",
                 "posterior_mean_coef2"):
        g = getattr(golden, attr, None)
        o = getattr(ours, attr, None)
        if g is None or o is None:
            continue
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(g.detach().cpu()), rtol=2e-5,
            atol=2e-6, err_msg=f"{attr} diverges from the reference",
        )


def test_q_sample_matches_reference(ref):
    import torch

    golden = ref.DiscreteNoiseScheduler(
        schedule_type="cosine", num_scales=1000, loss_type="l2",
        importance_sampler=_IMPORTANCE,
    )
    from xdiffusion_tpu.scheduler import DiscreteNoiseScheduler

    ours = DiscreteNoiseScheduler.create("cosine", 1000)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    eps = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    t = np.array([17, 943])
    # Reference layout is NCHW.
    g = golden.q_sample(
        torch.from_numpy(x0).permute(0, 3, 1, 2),
        torch.from_numpy(t),
        torch.from_numpy(eps).permute(0, 3, 1, 2),
    )
    g = np.asarray(g.permute(0, 2, 3, 1))
    import jax.numpy as jnp

    o = np.asarray(
        ours.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(eps))
    )
    np.testing.assert_allclose(o, g, rtol=2e-5, atol=2e-5)


def test_continuous_logsnr_schedule_matches(ref):
    import torch

    try:
        golden = ref.ContinuousNoiseScheduler(
            num_scales=1024, logsnr_schedule="cosine", loss_type="l2",
            logsnr_min=-20, logsnr_max=20,
        )
    except Exception as e:
        pytest.skip(f"reference continuous scheduler signature differs: {e}")
    from xdiffusion_tpu.scheduler import ContinuousNoiseScheduler

    ours = ContinuousNoiseScheduler.create(
        num_scales=1024, logsnr_schedule="cosine",
        logsnr_min=-20, logsnr_max=20,
    )
    t = np.linspace(1e-4, 1.0 - 1e-4, 37).astype(np.float32)
    fn = getattr(golden, "logsnr", None) or getattr(
        golden, "log_snr", None
    )
    if fn is None:
        pytest.skip("reference exposes no logsnr accessor")
    g = np.asarray(fn(torch.from_numpy(t)).detach().cpu())
    import jax.numpy as jnp

    o = np.asarray(ours.logsnr(jnp.asarray(t)))
    np.testing.assert_allclose(o, g, rtol=1e-4, atol=1e-4)


def test_edm_vp_sigma_curves_match(ref):
    import torch

    import xdiffusion.score_networks.edm as ref_edm

    tiny_model = {
        "target": "xdiffusion.score_networks.edm.SongUNet",
        "params": {
            "img_resolution": 16, "in_channels": 1, "out_channels": 1,
            "label_dim": 0, "augment_dim": 0, "model_channels": 8,
            "channel_mult": [1], "num_blocks": 1, "attn_resolutions": [],
        },
    }
    golden = ref_edm.VPPrecond(
        img_resolution=16, img_channels=1, label_dim=0, model=tiny_model,
    )
    from xdiffusion_tpu.score_networks.edm import VPPrecond

    ours = VPPrecond(
        model={
            "target": "xdiffusion.score_networks.edm.SongUNet",
            "params": {
                "img_resolution": 16, "in_channels": 1, "out_channels": 1,
                "label_dim": 0, "augment_dim": 0, "model_channels": 8,
                "channel_mult": [1], "channel_mult_emb": 4, "num_blocks": 1,
                "attn_resolutions": [], "dropout": 0.0,
                "embedding_type": "positional", "channel_mult_noise": 1,
                "encoder_type": "standard", "decoder_type": "standard",
                "resample_filter": [1, 1],
            },
        }
    )
    t = np.linspace(1e-3, 1.0, 23).astype(np.float32)
    g_sigma = np.asarray(golden.sigma(torch.from_numpy(t)).detach().cpu())
    o_sigma = np.asarray(ours.sigma(t))
    np.testing.assert_allclose(o_sigma, g_sigma, rtol=2e-4, atol=1e-5)
    g_inv = np.asarray(
        golden.sigma_inv(torch.from_numpy(g_sigma)).detach().cpu()
    )
    o_inv = np.asarray(ours.sigma_inv(o_sigma))
    np.testing.assert_allclose(o_inv, g_inv, rtol=2e-4, atol=1e-5)
    assert abs(float(golden.sigma_min) - ours.sigma_min) < 1e-4
    assert abs(float(golden.sigma_max) - ours.sigma_max) < 1e-2 * max(
        1.0, ours.sigma_max
    )
