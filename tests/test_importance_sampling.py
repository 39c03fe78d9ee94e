"""Importance sampler tests."""

import jax
import numpy as np

from xdiffusion_tpu.importance_sampling import ImportanceSampler, UniformSampler


def test_uniform_sampler_device_side():
    s = UniformSampler(100)
    assert s.device_side
    t, w = s.sample_device(jax.random.PRNGKey(0), 512)
    t = np.asarray(t)
    assert t.min() >= 0 and t.max() < 100
    assert np.all(np.asarray(w) == 1.0)


def test_importance_sampler_warmup_then_reweights():
    s = ImportanceSampler(num_timesteps=4, history_per_term=2, uniform_prob=0.0)
    # Before warmup: uniform weights.
    np.testing.assert_allclose(s.weights(), np.ones(4))
    # Fill history: timestep 3 gets big losses.
    ts = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    losses = np.array([1.0, 1.0, 1.0, 10.0, 1.0, 1.0, 1.0, 10.0])
    s.update_with_all_losses(ts, losses)
    w = s.weights()
    assert w[3] > w[0]
    # Unbiasedness: sampled weights are 1/(T*p).
    t, weights = s.sample(4096, rng=np.random.default_rng(0))
    p = w / w.sum()
    np.testing.assert_allclose(
        weights, 1.0 / (4 * p[t]), rtol=1e-6
    )


def test_importance_sampler_history_rolls():
    s = ImportanceSampler(num_timesteps=2, history_per_term=2)
    s.update_with_all_losses([0, 0, 0], [1.0, 2.0, 3.0])
    # Oldest (1.0) shifted out.
    np.testing.assert_allclose(s._loss_history[0], [2.0, 3.0])


def test_device_importance_matches_host():
    """device_update/device_weights reproduce the host loss-history
    implementation exactly (including duplicate timesteps in a batch and
    the pre-warmup uniform fallback)."""
    import jax
    import jax.numpy as jnp

    host = ImportanceSampler(num_timesteps=6, history_per_term=3)
    dev = ImportanceSampler(num_timesteps=6, history_per_term=3)
    st = dev.init_device_state()

    rng = np.random.default_rng(0)
    for _ in range(8):
        ts = rng.integers(0, 6, size=(5,))
        losses = rng.random(5).astype(np.float32)
        host.update_with_all_losses(ts, losses)
        st = jax.jit(dev.device_update)(st, jnp.asarray(ts), jnp.asarray(losses))

    np.testing.assert_allclose(
        np.asarray(st["loss_history"]), host._loss_history, rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(st["loss_counts"]), host._loss_counts)

    w_host = host.weights()
    p_host = w_host / np.sum(w_host)
    p_dev = np.asarray(dev.device_weights(st))
    np.testing.assert_allclose(p_dev, p_host, rtol=1e-5)

    t, w = jax.jit(lambda r: dev.device_sample(r, 16, st))(jax.random.PRNGKey(0))
    assert t.shape == (16,) and w.shape == (16,)
    assert np.all((np.asarray(t) >= 0) & (np.asarray(t) < 6))
    np.testing.assert_allclose(
        np.asarray(w), 1.0 / (6 * p_dev[np.asarray(t)]), rtol=1e-5
    )


def test_device_importance_pre_warmup_uniform():
    import jax

    dev = ImportanceSampler(num_timesteps=10, history_per_term=5)
    st = dev.init_device_state()
    p = np.asarray(dev.device_weights(st))
    np.testing.assert_allclose(p, np.full(10, 0.1), rtol=1e-6)
    t, w = dev.device_sample(jax.random.PRNGKey(1), 8, st)
    np.testing.assert_allclose(np.asarray(w), np.ones(8), rtol=1e-5)
