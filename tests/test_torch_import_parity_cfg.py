"""Classifier-free-guidance sampling golden parity vs the torch stack.

With identical imported weights, identical initial noise, and a
deterministic DDIM trajectory, guided sampling (w=2: eps = uncond +
w*(cond - uncond), reference samplers/ancestral.py:213-238 — the
reference also lerps the variance the same way) must match end to end.
This exercises the full CFG plumbing no single-network test covers:
the UnconditionalTextPromptsAdapter, the GPT-2 BPE prompt tokenization
of BOTH contexts, the double score evaluation, and the guided-epsilon
combination inside the jitted scan.
"""

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import (
    build_reference_score_network,
    import_reference,
    randomize_zero_init,
)

import os

# ddpm_8x8_epsilon (text-conditional CFG) moved onto the continuous
# cosine-logsnr scheduler: the reference DDIM sampler requires logsnr_t
# (samplers/ddim.py:43), which the discrete scheduler never provides.
CONFIG = os.path.join(
    os.path.dirname(__file__), "fixtures", "cfg_trajectory_parity.yaml"
)


def test_cfg_ddim_trajectory_matches_reference(monkeypatch):
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")

    torch.manual_seed(0)
    ref_net, _ = build_reference_score_network(CONFIG)
    ref_sd = randomize_zero_init(ref_net.state_dict())

    from xdiffusion.diffusion.ddpm import GaussianDiffusion_DDPM as RefDDPM
    from xdiffusion.samplers.ddim import DDIMSampler as RefDDIM
    from xdiffusion.utils import load_yaml as ref_load_yaml

    ref_model = RefDDPM(ref_load_yaml(CONFIG))
    ref_model._score_network.load_state_dict(ref_sd)
    ref_model.eval()

    # Reference bug: DDIM's CFG branch calls _pred_epsilon without the
    # required diffusion_model argument (samplers/ddim.py:63-66) and
    # crashes as shipped. Default it so the torch side can run guided.
    _orig_pred = RefDDIM._pred_epsilon

    def _pred(self, x, context, diffusion_model=None, epsilon_v_param=None):
        return _orig_pred(
            self,
            x=x,
            context=context,
            diffusion_model=(
                diffusion_model if diffusion_model is not None else ref_model
            ),
            epsilon_v_param=epsilon_v_param,
        )

    monkeypatch.setattr(RefDDIM, "_pred_epsilon", _pred)

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.importers import import_score_network_params
    from xdiffusion_tpu.samplers.ddim import DDIMSampler

    cfg = load_yaml(CONFIG)
    ours = GaussianDiffusion_DDPM(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in ref_sd.items()}
    )

    rng = np.random.default_rng(9)
    noise = rng.standard_normal((2, 1, 8, 8), dtype=np.float32)
    prompts = ["three", "seven"]

    with torch.no_grad():
        ref_samples, _ = ref_model.sample(
            context={"text_prompts": list(prompts)},
            num_samples=2,
            num_sampling_steps=5,
            sampler=RefDDIM(),
            classifier_free_guidance=2.0,
            initial_noise=torch.from_numpy(noise),
        )
    ref_samples = ref_samples.numpy()

    our_samples = ours.sample(
        params,
        jax.random.PRNGKey(1),
        num_samples=2,
        context={"text_prompts": list(prompts)},
        num_sampling_steps=5,
        sampler=DDIMSampler(),
        classifier_free_guidance=2.0,
        initial_noise=np.transpose(noise, (0, 2, 3, 1)),
    )
    our_samples = np.transpose(np.asarray(our_samples), (0, 3, 1, 2))

    np.testing.assert_allclose(our_samples, ref_samples, atol=5e-4, rtol=5e-3)

    # Guidance must actually bite: w=2 and w=0 (pure unconditional)
    # trajectories diverge.
    our_uncond = ours.sample(
        params,
        jax.random.PRNGKey(1),
        num_samples=2,
        context={"text_prompts": list(prompts)},
        num_sampling_steps=5,
        sampler=DDIMSampler(),
        classifier_free_guidance=0.0,
        initial_noise=np.transpose(noise, (0, 2, 3, 1)),
    )
    assert np.abs(np.asarray(our_uncond) - np.asarray(
        np.transpose(our_samples, (0, 2, 3, 1))
    )).max() > 1e-3
