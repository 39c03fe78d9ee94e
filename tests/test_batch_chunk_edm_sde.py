"""Chunked large-batch forward parity for the EDM preconditioner and the
score-SDE process (ops/batch_chunk.py dispatch added alongside the DDPM
one in diffusion/ddpm.py): the lax.map chunking must be numerically
equivalent to the direct forward for every process family that samples
through it."""

import jax
import jax.numpy as jnp
import numpy as np

from test_edm import tiny_edm_config
from test_sde import tiny_sde_config
from xdiffusion_tpu.diffusion.edm import GaussianDiffusion_EDM
from xdiffusion_tpu.diffusion.sde import GaussianDiffusion_SDE


def test_edm_precond_chunked_matches_direct(monkeypatch):
    model = GaussianDiffusion_EDM(tiny_edm_config())
    params = model.init_params(jax.random.PRNGKey(0))
    net = model.score_network()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 1))
    sigma = jnp.full((8,), 2.5)

    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "0")
    direct = net.apply(params, x, sigma)
    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "4")
    chunked = net.apply(params, x, sigma)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(chunked), atol=1e-6
    )


def test_edm_sampling_chunked_matches_direct(monkeypatch):
    model = GaussianDiffusion_EDM(tiny_edm_config())
    params = model.init_params(jax.random.PRNGKey(0))

    def sample():
        return np.asarray(
            model.sample(params, jax.random.PRNGKey(7), num_samples=8)
        )

    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "0")
    model._sample_fn_cache.clear()
    base = sample()
    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "4")
    model._sample_fn_cache.clear()
    chunked = sample()
    model._sample_fn_cache.clear()
    np.testing.assert_allclose(base, chunked, atol=1e-5)


def test_sde_predict_score_chunked_matches_direct(monkeypatch):
    model = GaussianDiffusion_SDE(tiny_sde_config())
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 1))
    t = jnp.linspace(0.1, 0.9, 8)

    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "0")
    direct = model.predict_score(params, x, t)
    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "4")
    chunked = model.predict_score(params, x, t)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(chunked), atol=1e-5
    )
