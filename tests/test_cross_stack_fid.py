"""Regression guard for tools/cross_stack_fid.py — the round's headline
quality instrument. Runs the WHOLE pipeline tiny (random-init flagship
checkpoint, 3 ancestral steps, 8 samples, CPU): checkpoint restore, jax
sampling with the injected noise sequence, flax->torch export, reference
model construction from the reference's own YAML, torch sampling with
the same noise, shared-extractor FID on both sample sets. With shared
weights and shared noise the stacks' trajectories must agree to
numerics: pixel MAE ~ 0 and identical FIDs.
"""

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
    REPO, "configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml"
)


def test_cross_stack_fid_pipeline(tmp_path, monkeypatch, capsys):
    from tests.reference_helpers import import_reference

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import create_train_state
    from xdiffusion_tpu.training.image.train import build_model

    ckpt_dir = str(tmp_path / "ckpt")
    model = build_model(load_yaml(CONFIG))
    params = model.init_params(jax.random.PRNGKey(42))
    state = create_train_state(params, default_optimizer().build(), ema=True)
    checkpoints.save_checkpoint(ckpt_dir, state, step=0)

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "cross_stack_fid.py",
            "--config_path", CONFIG,
            "--checkpoint", ckpt_dir,
            "--num_samples", "8",
            "--sampling_steps", "3",
            "--sample_batch", "8",
            "--torch_batch", "8",
            "--extractor_steps", "30",
        ],
    )
    runpy.run_path(
        os.path.join(REPO, "tools/cross_stack_fid.py"), run_name="__main__"
    )
    out = capsys.readouterr().out.strip().splitlines()
    result = json.loads(out[-1])
    # fp32 + shared weights + shared noise: the stacks must agree tightly.
    assert result["cross_stack_pixel_mae"] < 1e-4, result
    assert abs(result["fid_delta_pct"]) < 0.5, result
    assert np.isfinite(result["fid_tpu"]) and np.isfinite(result["fid_torch"])
