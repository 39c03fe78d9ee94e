"""Score-SDE trajectory golden parity against the reference torch stack.

With identical imported UNet weights and identical prior latents, the
probability-flow Euler-Maruyama predictor (deterministic: the reverse
SDE's diffusion term is zero under probability flow) must produce the
same 8-step trajectory in both stacks. This exercises the continuous
VPSDE coefficients, `sde.reverse`, the PC sampler dispatch, and the
reference's fixed time grid `linspace(T, 1e-3, sde.N)`
(reference diffusion/sde.py:288-345, samplers/pc.py:139-154).

The reference's SDE `sample()` ignores its `initial_noise` argument and
always draws from `sde.prior_sampling` (diffusion/sde.py:326) — the test
pins the starting latents by monkeypatching `prior_sampling` on both the
torch side (VPSDE prior is a unit Gaussian) and passing `initial_noise`
on ours.
"""

import os

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import import_reference, randomize_zero_init

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "sde_trajectory_parity.yaml"
)


@pytest.mark.parametrize(
    "predictor", ["ReverseDiffusionPredictor", "EulerMaruyamaPredictor"]
)
def test_probability_flow_pc_trajectory_matches_reference(
    predictor, monkeypatch
):
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.diffusion.sde import GaussianDiffusion_SDE as RefSDE
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.sde import GaussianDiffusion_SDE
    from xdiffusion_tpu.importers import import_score_network_params

    if predictor == "EulerMaruyamaPredictor":
        # The reference's Euler-Maruyama probability-flow path crashes
        # as-shipped: RSDE.sde returns the float 0.0 for the diffusion
        # under probability flow (sde/base.py:143) and pc.py:152 indexes
        # it. Recover the intended Eq. 13 semantics (pure ODE step, no
        # noise term) at the boundary so we can compare against it.
        from xdiffusion.samplers import pc as ref_pc

        def fixed_update(self, x, context):
            dt = -1.0 / self.rsde.N
            drift, diffusion = self.rsde.sde(x, context)
            x_mean = x + drift * dt
            if isinstance(diffusion, float):
                return x_mean, x_mean
            z = torch.randn_like(x)
            scale = diffusion[:, None, None, None] * float(np.sqrt(-dt))
            return x_mean + scale * z, x_mean

        monkeypatch.setattr(
            ref_pc.EulerMaruyamaPredictor, "update", fixed_update
        )

    def with_predictor(cfg_dict):
        cfg_dict["diffusion"]["sampling"]["params"]["predictor"][
            "target"
        ] = f"xdiffusion.samplers.pc.{predictor}"
        return cfg_dict

    torch.manual_seed(5)
    ref_cfg = ref_load_yaml(FIXTURE)
    with_predictor(ref_cfg.to_dict())
    ref_model = RefSDE(ref_cfg)
    sd = randomize_zero_init(ref_model._score_network.state_dict())
    ref_model._score_network.load_state_dict(sd)
    ref_model.eval()

    rng = np.random.default_rng(41)
    noise = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    monkeypatch.setattr(
        ref_model._sde,
        "prior_sampling",
        lambda shape: torch.from_numpy(noise),
    )

    with torch.no_grad():
        ref_out = ref_model.sample(context={}, num_samples=2)
    ref_samples = (
        ref_out[0] if isinstance(ref_out, tuple) else ref_out
    ).numpy()

    cfg = load_yaml(FIXTURE)
    with_predictor(cfg.to_dict())
    ours = GaussianDiffusion_SDE(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in sd.items()}
    )

    with jax.default_matmul_precision("highest"):
        our_samples = ours.sample(
            params,
            jax.random.PRNGKey(1),
            num_samples=2,
            initial_noise=np.transpose(noise, (0, 2, 3, 1)),
        )
    our_samples = np.transpose(np.asarray(our_samples), (0, 3, 1, 2))

    np.testing.assert_allclose(our_samples, ref_samples, atol=1e-3, rtol=5e-3)
