"""Chunked large-batch forward (ops/batch_chunk.py): the lax.map
chunking that keeps XLA on the channels-minor layout must be exactly
equivalent to the direct forward, and must leave shared (non-batch)
context leaves alone."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.ops.batch_chunk import chunk_batched_apply
from tests.test_diffusion import tiny_config
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
from xdiffusion_tpu.samplers.ddim import DDIMSampler


def test_chunked_apply_matches_direct():
    calls = []

    def apply_fn(x, ctx):
        calls.append(x.shape[0])
        return x * 2.0 + ctx["timestep"][:, None, None, None]

    x = jnp.arange(8 * 4 * 4 * 1, dtype=jnp.float32).reshape(8, 4, 4, 1)
    ctx = {
        "timestep": jnp.arange(8, dtype=jnp.float32),
        "shared_table": jnp.ones((3, 5)),  # leading dim != batch: not split
        "scalar": 2,
    }
    direct = apply_fn(x, ctx)
    chunked = chunk_batched_apply(apply_fn, x, ctx, chunk=2)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(chunked))
    assert 2 in calls  # the chunked path really ran at chunk size


def test_chunked_apply_noop_below_chunk_and_non_divisible():
    def apply_fn(x, ctx):
        return x + 1.0

    x = jnp.zeros((4, 2, 2, 1))
    out = chunk_batched_apply(apply_fn, x, {}, chunk=8)
    assert out.shape == x.shape
    # 6 % 4 != 0 -> direct call, no error
    x6 = jnp.zeros((6, 2, 2, 1))
    out6 = chunk_batched_apply(apply_fn, x6, {}, chunk=4)
    assert out6.shape == x6.shape


def test_predict_score_chunked_matches_unchunked(monkeypatch):
    model = GaussianDiffusion_DDPM(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 1))
    ctx = {"timestep": jnp.zeros((8,), dtype=jnp.int32)}

    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "0")
    direct = model.predict_score(params, x, ctx)
    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "4")
    chunked = model.predict_score(params, x, ctx)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(chunked), atol=1e-6
    )


def test_sampling_chunked_matches_unchunked(monkeypatch):
    """The full 10-step DDIM scan must be bitwise-stable under chunking
    (same rng folding, same trajectory)."""
    model = GaussianDiffusion_DDPM(tiny_config(num_scales=10))
    params = model.init_params(jax.random.PRNGKey(0))

    def sample():
        return np.asarray(
            model.sample(
                params,
                jax.random.PRNGKey(7),
                num_samples=8,
                num_sampling_steps=10,
                sampler=DDIMSampler(),
            )
        )

    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "0")
    model._sample_fn_cache.clear()
    base = sample()
    monkeypatch.setenv("XDIFFUSION_FORWARD_CHUNK", "4")
    model._sample_fn_cache.clear()
    chunked = sample()
    model._sample_fn_cache.clear()
    np.testing.assert_allclose(base, chunked, atol=1e-5)
