"""tools/import_torch_checkpoint.py: torch .pt (reference training-
checkpoint format) -> orbax, end to end. The mapping itself is golden-
parity tested per network; this guards the CLI surface: state_dict
unwrapping, importer dispatch from the YAML, orbax write, and that the
restored checkpoint bit-matches a direct library import."""

import json
import os
import runpy
import sys

import jax
import numpy as np
import pytest

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(
    REPO, "tests", "fixtures", "ancestral_trajectory_parity.yaml"
)


def test_import_cli_roundtrip(tmp_path, monkeypatch, capsys):
    import torch

    from tests.reference_helpers import (
        build_reference_score_network,
        import_reference,
        randomize_zero_init,
    )

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")

    torch.manual_seed(0)
    ref_net, _ = build_reference_score_network(CONFIG)
    sd = randomize_zero_init(ref_net.state_dict())
    pt_path = str(tmp_path / "reference.pt")
    # The reference trainer's on-disk format (training/image/train.py
    # save()): a dict wrapping model_state_dict.
    torch.save({"model_state_dict": sd, "step": 1234}, pt_path)

    out_dir = str(tmp_path / "orbax")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "import_torch_checkpoint.py",
            "--config_path", CONFIG,
            "--torch_checkpoint", pt_path,
            "--output", out_dir,
            "--step", "1234",
        ],
    )
    runpy.run_path(
        os.path.join(REPO, "tools", "import_torch_checkpoint.py"),
        run_name="__main__",
    )
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["step"] == 1234
    assert info["imported_torch_tensors"] == len(sd)

    # Restored orbax checkpoint == direct library import, leaf for leaf.
    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.importers import import_score_network_params
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import create_train_state

    cfg = load_yaml(CONFIG)
    model = GaussianDiffusion_DDPM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    state = create_train_state(params, default_optimizer().build(), ema=True)
    restored, step = checkpoints.restore_checkpoint(out_dir, state)
    assert step == 1234

    want = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in sd.items()}
    )
    got_leaves = jax.tree_util.tree_leaves_with_path(restored.params)
    want_map = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(got_leaves) == len(want_map)
    for path, leaf in got_leaves:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(want_map[path]),
            err_msg=jax.tree_util.keystr(path),
        )


def test_import_cli_vae_roundtrip(tmp_path, monkeypatch, capsys):
    """--component vae: reference AutoencoderKL state_dict -> VAETrainState
    orbax checkpoint whose 'ae' subtree bit-matches a direct library
    import."""
    import torch

    from tests.reference_helpers import import_reference, randomize_zero_init

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")

    from xdiffusion.autoencoders.kl import AutoencoderKL as RefVAE
    from xdiffusion.utils import DotConfig as RefDotConfig

    from xdiffusion_tpu.config import load_yaml

    config_path = os.path.join(REPO, "tests", "fixtures", "vae_import_cli.yaml")
    cfg = load_yaml(config_path)
    torch.manual_seed(0)
    ref = RefVAE(
        RefDotConfig(
            {
                "embed_dim": 4,
                "encoder_decoder_config":
                    cfg.autoencoder.params.encoder_decoder_config.to_dict(),
                "loss_config": {"target": "torch.nn.Identity", "params": {}},
            }
        )
    )
    sd = randomize_zero_init(ref.state_dict())
    pt_path = str(tmp_path / "vae.pt")
    torch.save({"model_state_dict": sd}, pt_path)

    out_dir = str(tmp_path / "vae_orbax")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "import_torch_checkpoint.py",
            "--config_path", config_path,
            "--torch_checkpoint", pt_path,
            "--output", out_dir,
            "--component", "vae",
        ],
    )
    runpy.run_path(
        os.path.join(REPO, "tools", "import_torch_checkpoint.py"),
        run_name="__main__",
    )
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["component"] == "vae"
    assert info["importer"] == "import_autoencoder_kl_params"

    import jax.numpy as jnp
    import optax

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import instantiate_from_config
    from xdiffusion_tpu.importers.autoencoders import (
        import_autoencoder_kl_params,
    )
    from xdiffusion_tpu.training.image.autoencoder import VAETrainState

    vae = instantiate_from_config(
        cfg.autoencoder.to_dict(), use_config_struct=True
    )
    params = vae.init_params(jax.random.PRNGKey(0))
    state = VAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_ae=optax.adam(1e-4).init(params["ae"]),
        opt_disc=optax.adam(1e-4).init(params.get("disc", {})),
    )
    restored, _ = checkpoints.restore_checkpoint(out_dir, state)
    want = import_autoencoder_kl_params(
        params["ae"], {k: v.detach().numpy() for k, v in sd.items()}
    )
    got = dict(jax.tree_util.tree_leaves_with_path(restored.params["ae"]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(want):
        np.testing.assert_array_equal(
            np.asarray(got[path]), np.asarray(leaf),
            err_msg=jax.tree_util.keystr(path),
        )
