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
