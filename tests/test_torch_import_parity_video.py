"""Video (5D) ancestral sampling trajectory golden parity vs torch.

Network-level forward parity exists for every video architecture; this
covers what those cannot: the full VIDEO reverse process end to end —
5D (B, F, H, W, C) latents through the jitted scan, the v-prediction
posterior on the continuous cosine-logsnr scheduler, per-frame folding
through the factorized UNet3D, and the per-step stochastic update —
against the reference stack with identical imported weights, identical
initial noise, and an identical injected per-step noise sequence
(reference sampler: samplers/ancestral.py torch.randn_like per step).
"""

import os

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import (
    build_reference_score_network,
    import_reference,
    randomize_zero_init,
)

CONFIG = os.path.join(
    os.path.dirname(__file__), "fixtures", "video_trajectory_parity.yaml"
)
STEPS = 5
SHAPE_TORCH = (2, 1, 4, 8, 8)  # B, C, F, H, W


def test_video_ancestral_trajectory_matches_reference(monkeypatch):
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")

    torch.manual_seed(0)
    ref_net, _ = build_reference_score_network(CONFIG)
    ref_sd = randomize_zero_init(ref_net.state_dict())

    from xdiffusion.diffusion.ddpm import GaussianDiffusion_DDPM as RefDDPM
    from xdiffusion.utils import load_yaml as ref_load_yaml

    ref_model = RefDDPM(ref_load_yaml(CONFIG))
    ref_model._score_network.load_state_dict(ref_sd)
    ref_model.eval()

    rng = np.random.default_rng(17)
    noise0 = rng.standard_normal(SHAPE_TORCH, dtype=np.float32)
    step_noise = rng.standard_normal((STEPS,) + SHAPE_TORCH, dtype=np.float32)

    queue = [torch.from_numpy(n) for n in step_noise]

    def fake_randn_like(x, *a, **k):
        assert queue, "more noise draws than reverse steps"
        n = queue.pop(0)
        assert n.shape == x.shape
        return n.to(x.dtype)

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)

    with torch.no_grad():
        ref_samples, _ = ref_model.sample(
            context={},
            num_samples=2,
            num_sampling_steps=STEPS,
            initial_noise=torch.from_numpy(noise0),
        )
    ref_samples = ref_samples.numpy()
    assert not queue, "reference consumed fewer noise draws than expected"

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.importers import import_score_network_params

    cfg = load_yaml(CONFIG)
    ours = GaussianDiffusion_DDPM(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in ref_sd.items()}
    )

    # BCFHW -> BFHWC
    to_ours = lambda v: np.transpose(v, (0, 2, 3, 4, 1))
    with jax.default_matmul_precision("highest"):
        our_samples = ours.sample(
            params,
            jax.random.PRNGKey(1),
            num_samples=2,
            context={
                "sampling_noise": np.stack([to_ours(n) for n in step_noise])
            },
            num_sampling_steps=STEPS,
            initial_noise=to_ours(noise0),
        )
    our_samples = np.transpose(np.asarray(our_samples), (0, 4, 1, 2, 3))

    np.testing.assert_allclose(our_samples, ref_samples, atol=1e-3, rtol=5e-3)
