"""Network-level golden parity: run the reference PyTorch score networks
and ours on IDENTICAL weights and inputs, and require matching outputs.

This is the strongest parity evidence available without trained
checkpoints: the reference net is randomly initialized (fixed torch
seed), its state_dict imported into our flax tree via
`xdiffusion_tpu.importers`, and both forward passes compared in fp32.
Reference forward entry points: score_networks/unet.py:265-299,
score_networks/dit.py:206-229.
"""

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import build_reference_score_network

CONFIGS = "/root/reference/configs/image/mnist"


def _ref_net(config_path):
    try:
        return build_reference_score_network(config_path)
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")


def test_unet_forward_matches_reference():
    import torch

    torch.manual_seed(0)
    net, _ = _ref_net(f"{CONFIGS}/ddpm_32x32_epsilon_discrete.yaml")

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.importers import import_score_network_params

    cfg = load_yaml(f"{CONFIGS}/ddpm_32x32_epsilon_discrete.yaml")
    ours = GaussianDiffusion_DDPM(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(cfg, params, {
        k: v.detach().numpy() for k, v in net.state_dict().items()
    })

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    t = np.array([17, 501], dtype=np.int64)

    with torch.no_grad():
        ref_out = net(
            torch.from_numpy(x), {"timestep": torch.from_numpy(t)}
        ).numpy()

    our_out = ours.predict_score(
        params,
        np.transpose(x, (0, 2, 3, 1)),
        {"timestep": np.asarray(t, dtype=np.int32)},
    )
    our_out = np.transpose(np.asarray(our_out), (0, 3, 1, 2))

    np.testing.assert_allclose(our_out, ref_out, atol=2e-4, rtol=2e-3)


def test_dit_forward_matches_reference():
    import torch

    torch.manual_seed(0)
    net, _ = _ref_net(f"{CONFIGS}/dit.yaml")

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.importers import import_score_network_params

    cfg = load_yaml(f"{CONFIGS}/dit.yaml")
    ours = GaussianDiffusion_DDPM(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(cfg, params, {
        k: v.detach().numpy() for k, v in net.state_dict().items()
    })

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    t = np.array([3, 880], dtype=np.int64)
    classes = np.array([4, 9], dtype=np.int64)

    with torch.no_grad():
        ref_out = net(
            torch.from_numpy(x),
            {
                "timestep": torch.from_numpy(t),
                "classes": torch.from_numpy(classes),
            },
        )
    if isinstance(ref_out, (tuple, list)):
        ref_out = ref_out[0]
    ref_out = ref_out.numpy()

    our_out = ours.predict_score(
        params,
        np.transpose(x, (0, 2, 3, 1)),
        {
            "timestep": np.asarray(t, dtype=np.int32),
            "classes": np.asarray(classes, dtype=np.int32),
        },
    )
    if isinstance(our_out, (tuple, list)):
        our_out = our_out[0]
    our_out = np.transpose(np.asarray(our_out), (0, 3, 1, 2))

    np.testing.assert_allclose(our_out, ref_out, atol=2e-4, rtol=2e-3)
