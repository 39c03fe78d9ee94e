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
