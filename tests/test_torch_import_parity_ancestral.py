"""Stochastic ancestral (DDPM) trajectory golden parity vs the torch stack.

The default reference sampler draws fresh gaussian noise every reverse
step (samplers/ancestral.py:59 torch.randn_like); with the SAME imported
weights, SAME initial noise, and the SAME injected per-step noise
sequence, the full 10-step learned-sigma trajectory must match end to
end. This covers what the deterministic DDIM test cannot: the posterior
q(x_{t-1}|x_t,x0) mean reparameterization, the learned-variance
range-lerp, and the noise-scaled stochastic update inside our jitted
scan (noise threaded via the `sampling_noise` scan override).
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
    os.path.dirname(__file__), "fixtures", "ancestral_trajectory_parity.yaml"
)
STEPS = 10


def test_ancestral_trajectory_matches_reference(monkeypatch):
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

    rng = np.random.default_rng(11)
    noise0 = rng.standard_normal((2, 1, 8, 8), dtype=np.float32)
    step_noise = rng.standard_normal((STEPS, 2, 1, 8, 8), dtype=np.float32)

    # Inject the deterministic noise sequence into the reference sampler
    # (it draws torch.randn_like once per reverse step).
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

    our_samples = ours.sample(
        params,
        jax.random.PRNGKey(1),
        num_samples=2,
        context={"sampling_noise": np.transpose(step_noise, (0, 1, 3, 4, 2))},
        num_sampling_steps=STEPS,
        initial_noise=np.transpose(noise0, (0, 2, 3, 1)),
    )
    our_samples = np.transpose(np.asarray(our_samples), (0, 3, 1, 2))

    np.testing.assert_allclose(our_samples, ref_samples, atol=5e-4, rtol=5e-3)

    # The injected noise must actually flow: a different noise sequence
    # diverges the trajectory.
    alt = ours.sample(
        params,
        jax.random.PRNGKey(1),
        num_samples=2,
        context={
            "sampling_noise": np.transpose(step_noise[::-1], (0, 1, 3, 4, 2))
        },
        num_sampling_steps=STEPS,
        initial_noise=np.transpose(noise0, (0, 2, 3, 1)),
    )
    assert (
        np.abs(np.asarray(alt) - np.transpose(our_samples, (0, 2, 3, 1))).max()
        > 1e-3
    )
