"""Progressive-distillation golden parity against the reference stack.

With identical imported weights serving as BOTH teacher and student, an
identical image batch, and injected timesteps/epsilon, the scalar
distillation objective must match the reference's
`distillation_loss_on_batch` (reference diffusion/ddpm.py:338-542): two
teacher DDIM half-steps -> z_teacher -> implied x/eps targets -> SNR
(eps-MSE) weighted student loss. This was the one loss path without a
torch parity witness through round 4.
"""

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import import_reference, randomize_zero_init

CONFIG = "/root/reference/configs/image/mnist/ddpm_32x32_v_continuous.yaml"


def test_distillation_loss_matches_reference(monkeypatch):
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.diffusion.ddpm import GaussianDiffusion_DDPM as RefDDPM
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.importers import import_score_network_params

    N = 64
    torch.manual_seed(11)
    ref_model = RefDDPM(ref_load_yaml(CONFIG))
    sd = randomize_zero_init(ref_model._score_network.state_dict())
    ref_model._score_network.load_state_dict(sd)
    ref_model.eval()

    b = 4
    rng = np.random.default_rng(29)
    net_params = ref_model._config.diffusion.score_network.params
    side = net_params.input_spatial_size
    images = rng.uniform(
        0.0, 1.0, size=(b, net_params.input_channels, side, side)
    ).astype(np.float32)
    eps = rng.standard_normal(images.shape).astype(np.float32)
    # i ~ Cat[0, N): include i=0 to exercise the t==0 x_pred branch.
    t_int = np.array([0, 5, 31, 60], dtype=np.int64)

    monkeypatch.setattr(
        torch, "randint", lambda *a, **k: torch.from_numpy(t_int).float()
    )
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.from_numpy(eps))

    with torch.no_grad():
        ref_losses = ref_model.distillation_loss_on_batch(
            torch.from_numpy(images),
            N,
            context={},
            teacher_diffusion_model=ref_model,
        )

    cfg = load_yaml(CONFIG)
    ours = GaussianDiffusion_DDPM(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in sd.items()}
    )

    with jax.default_matmul_precision("highest"):
        total, metrics = ours.distillation_loss_on_batch(
            params,
            params,  # same weights as teacher, matching the torch call
            jax.random.PRNGKey(1),
            np.transpose(images, (0, 2, 3, 1)),
            context={},
            N=N,
            timesteps=t_int.astype(np.float32) / N,
            noise=np.transpose(eps, (0, 2, 3, 1)),
        )

    np.testing.assert_allclose(
        float(total), float(ref_losses["loss"]), rtol=2e-3, atol=1e-5
    )
    assert np.isfinite(float(metrics["loss_per_example"].sum()))
