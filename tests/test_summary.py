"""Startup model-summary printout (reference print_model_summary,
/root/reference/xdiffusion/diffusion/ddpm.py:694-793)."""

import jax.numpy as jnp

from xdiffusion_tpu.config import load_yaml
from xdiffusion_tpu.summary import model_summary


def test_ddpm_summary_renders_table():
    cfg = load_yaml("configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml")
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM

    out = model_summary(GaussianDiffusion_DDPM(cfg), batch_size=2)
    assert "Unet" in out
    assert "Total Parameters" in out
    # The summary must reflect the real parameter count.
    assert "35,204,480" in out
    # Helper methods must not leak in as layer rows.
    assert "_net_config" not in out


def test_edm_summary_uses_sigma_signature():
    cfg = load_yaml("configs/image/mnist/edm.yaml")
    from xdiffusion_tpu.diffusion.edm import GaussianDiffusion_EDM

    out = model_summary(GaussianDiffusion_EDM(cfg), batch_size=2)
    assert "Total Parameters" in out


def test_summary_env_gate(monkeypatch):
    from xdiffusion_tpu import summary

    monkeypatch.setenv("XDIFFUSION_MODEL_SUMMARY", "0")
    assert not summary.summary_enabled()
    monkeypatch.setenv("XDIFFUSION_MODEL_SUMMARY", "1")
    assert summary.summary_enabled()
