"""E2E: the user-facing train() entry point under FSDP / TP / PP meshes.

Drives the REAL training CLI path (xdiffusion_tpu.training.image.train.train)
with XDIFFUSION_MESH set the way a user would set it, on the 8-virtual-CPU
device mesh, and asserts:

- parameters (and optimizer moments) are ACTUALLY sharded per the mesh
  axes (not silently replicated — the round-4 gap);
- the training loss matches a pure-DP run of the same seed/config;
- checkpoint save/restore round-trips a sharded state.

Reference role being replaced: accelerator.prepare()
(/root/reference/xdiffusion/training/image/train.py:215-226) — the
reference's only mode is DDP; fsdp/tensor/pipeline are TPU-native extras.
"""

import json
import os

import jax
import numpy as np
import pytest
import yaml

from tests.test_train_smoke import TINY_YAML


def _first_loss(out_dir):
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        rec = json.loads(f.readline())
    return rec["loss"]


def _all_losses(out_dir):
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        return [json.loads(line)["loss"] for line in f]


def _capture_shardings(monkeypatch):
    """Wrap parallel.shard_train_state to record the placed state."""
    import xdiffusion_tpu.parallel as par

    captured = {}
    real = par.shard_train_state

    def wrapper(state, mesh):
        placed, tree = real(state, mesh)
        captured["params"] = placed.params
        captured["opt_state"] = placed.opt_state
        captured["mesh"] = mesh
        return placed, tree

    monkeypatch.setattr(par, "shard_train_state", wrapper)
    return captured


def _sharded_axes(params):
    axes = set()
    for leaf in jax.tree_util.tree_leaves(params):
        spec = getattr(leaf.sharding, "spec", None)
        if spec is None:
            continue
        for entry in spec:
            if entry is None:
                continue
            if isinstance(entry, (tuple, list)):
                axes.update(entry)
            else:
                axes.add(entry)
    return axes


def _run(tmp_path, cfg_text, mesh_env, monkeypatch, name, steps=2,
         batch_size=16, **kw):
    from xdiffusion_tpu.training.image.train import train

    cfg = tmp_path / f"{name}.yaml"
    cfg.write_text(cfg_text)
    if mesh_env is None:
        monkeypatch.delenv("XDIFFUSION_MESH", raising=False)
    else:
        monkeypatch.setenv("XDIFFUSION_MESH", mesh_env)
    kw.setdefault("save_and_sample_every_n", 10_000)  # skip eval sampling
    return train(
        config_path=str(cfg),
        num_training_steps=steps,
        batch_size=batch_size,
        dataset_name="image/mnist",
        output_path=str(tmp_path / name),
        num_samples=4,
        **kw,
    )


def test_fsdp_mesh_shards_params_and_matches_dp(tmp_path, monkeypatch):
    # The tiny test UNet's tensors are all below the default 2**16-element
    # scatter floor; drop it so fsdp genuinely shards here.
    monkeypatch.setenv("XDIFFUSION_FSDP_MIN_SIZE", "1024")
    captured = _capture_shardings(monkeypatch)
    dp_dir = _run(tmp_path, TINY_YAML, "data=8", monkeypatch, "dp")
    dp_loss = _first_loss(dp_dir)

    fsdp_dir = _run(tmp_path, TINY_YAML, "data=4,fsdp=2", monkeypatch, "fsdp")
    # Params actually sharded over 'fsdp' — and so are the adam moments
    # (ZeRO-3, not just ZeRO-3-for-params).
    assert "fsdp" in _sharded_axes(captured["params"])
    assert "fsdp" in _sharded_axes(captured["opt_state"])
    assert dict(captured["mesh"].shape) == {"data": 4, "fsdp": 2}

    fsdp_loss = _first_loss(fsdp_dir)
    np.testing.assert_allclose(fsdp_loss, dp_loss, rtol=2e-4)


def test_fsdp_checkpoint_resume_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("XDIFFUSION_MESH", "data=4,fsdp=2")
    from xdiffusion_tpu.training.image.train import train

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    out_root = str(tmp_path / "out")
    out_dir = train(
        config_path=str(cfg),
        num_training_steps=2,
        batch_size=16,
        dataset_name="image/mnist",
        output_path=out_root,
        save_and_sample_every_n=2,
        num_samples=4,
    )
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    assert os.path.isdir(ckpt_dir)
    # Resume restores the SHARDED state (each array restored directly into
    # its fsdp layout) and continues training.
    out_dir2 = train(
        config_path=str(cfg),
        num_training_steps=4,
        batch_size=16,
        dataset_name="image/mnist",
        output_path=out_root,
        save_and_sample_every_n=100,
        resume_from=ckpt_dir,
        num_samples=4,
    )
    losses = _all_losses(out_dir2)
    assert len(losses) >= 1 and all(np.isfinite(losses))


def _tiny_dit_yaml(depth: int) -> str:
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/image/mnist/dit.yaml",
    )
    cfg = yaml.safe_load(open(base))
    p = cfg["diffusion"]["score_network"]["params"]
    p.update(
        {"hidden_size": 32, "depth": depth, "num_heads": 2, "patch_size": 8,
         "dropout": 0.0}
    )
    p["conditioning"]["projections"]["timestep"]["params"]["hidden_size"] = 32
    p["conditioning"]["projections"]["classes"]["params"]["hidden_size"] = 32
    cfg["diffusion"]["noise_scheduler"]["params"]["num_scales"] = 8
    cfg["diffusion"]["noise_scheduler"]["params"]["schedule_type"] = "cosine"
    return yaml.safe_dump(cfg)


def test_tensor_parallel_mesh_matches_dp(tmp_path, monkeypatch):
    captured = _capture_shardings(monkeypatch)
    cfg_text = _tiny_dit_yaml(depth=2)
    dp_dir = _run(tmp_path, cfg_text, "data=8", monkeypatch, "dit_dp")
    dp_loss = _first_loss(dp_dir)

    tp_dir = _run(
        tmp_path, cfg_text, "data=4,tensor=2", monkeypatch, "dit_tp"
    )
    # Megatron column/row kernels sharded over 'tensor'.
    assert "tensor" in _sharded_axes(captured["params"])
    assert "tensor" in _sharded_axes(captured["opt_state"])
    tp_loss = _first_loss(tp_dir)
    np.testing.assert_allclose(tp_loss, dp_loss, rtol=2e-4)


def test_pipeline_parallel_mesh_matches_dp(tmp_path, monkeypatch):
    cfg_text = _tiny_dit_yaml(depth=2)
    dp_dir = _run(tmp_path, cfg_text, "data=8", monkeypatch, "dit_dp2")
    dp_loss = _first_loss(dp_dir)

    # data=4, pipeline=2: 1 DiT block per stage, local batch 4, M=2.
    pp_dir = _run(
        tmp_path,
        cfg_text,
        "data=4,pipeline=2",
        monkeypatch,
        "dit_pp",
        save_and_sample_every_n=2,  # ALSO exercise eval sampling under PP
        steps=2,
    )
    pp_loss = _first_loss(pp_dir)
    np.testing.assert_allclose(pp_loss, dp_loss, rtol=2e-4)
    # Eval sampling ran unpipelined and produced a grid.
    assert os.path.exists(os.path.join(pp_dir, "sample-2.png"))
    # train() cleared the process-wide pipeline context on exit.
    from xdiffusion_tpu.parallel.pipeline import get_pipeline_context

    assert get_pipeline_context() is None


@pytest.fixture(autouse=True)
def _clear_parallel_contexts():
    yield
    from xdiffusion_tpu.ops.attention import set_sequence_parallel_mesh
    from xdiffusion_tpu.parallel.pipeline import set_pipeline_parallel_mesh

    set_sequence_parallel_mesh(None)
    set_pipeline_parallel_mesh(None)
