"""Numerical parity tests for the noise schedulers.

Validates against closed-form DDPM identities and independently recomputed
schedule constants (the math of Ho et al. 2020 / Nichol & Dhariwal 2021 /
Salimans & Ho 2022), which is also what the reference implements."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xdiffusion_tpu.scheduler import (
    ContinuousNoiseScheduler,
    DiscreteNoiseScheduler,
    DiscreteRectifiedFlowNoiseScheduler,
    elementwise_loss,
    make_beta_schedule,
)


def test_linear_betas_match_ddpm_constants():
    betas = make_beta_schedule("linear", 1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    # Rescaling invariance: any step count spans the same range * scale.
    betas100 = make_beta_schedule("linear", 100)
    assert betas100[0] == pytest.approx(1e-3)
    assert betas100[-1] == pytest.approx(0.2)


def test_cosine_betas_clipped_and_monotone_alphabar():
    betas = make_beta_schedule("cosine", 1000)
    assert np.all(betas <= 0.999) and np.all(betas >= 0.0)
    ac = np.cumprod(1 - betas)
    assert np.all(np.diff(ac) < 0)  # strictly decreasing signal level


def test_q_sample_then_predict_x_from_epsilon_roundtrip():
    sched = DiscreteNoiseScheduler.create("linear", 1000)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (4, 8, 8, 3))
    eps = jax.random.normal(k2, (4, 8, 8, 3))
    t = jax.random.randint(k3, (4,), 0, 1000)
    x_t = sched.q_sample(x0, t, eps)
    x0_hat = sched.predict_x_from_epsilon(x_t, eps, {"timestep": t})
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=2e-3)
    eps_hat = sched.predict_epsilon_from_x(x_t, x0, {"timestep": t})
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), atol=2e-2)


def test_v_parameterization_roundtrip():
    sched = DiscreteNoiseScheduler.create("cosine", 1000)
    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (4, 8, 8, 1))
    eps = jax.random.normal(k2, (4, 8, 8, 1))
    t = jax.random.randint(k3, (4,), 1, 999)
    v = sched.predict_v_from_x_and_epsilon(x0, eps, t)
    z = sched.q_sample(x0, t, eps)
    x0_hat = sched.predict_x_from_v(z, v, {"timestep": t})
    # alpha*z - sigma*v == (alpha^2+sigma^2)*x0 == x0
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)


def test_q_posterior_matches_closed_form():
    sched = DiscreteNoiseScheduler.create("linear", 100)
    betas = np.asarray(sched.betas)
    ac = np.asarray(sched.alphas_cumprod)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    t = jnp.array([5, 50, 99])
    x0 = jnp.ones((3, 2, 2, 1)) * 0.3
    xt = jnp.ones((3, 2, 2, 1)) * -0.7
    mean, var, logvar = sched.q_posterior(x0, xt, {"timestep": t})
    for i, ti in enumerate([5, 50, 99]):
        coef1 = betas[ti] * np.sqrt(ac_prev[ti]) / (1 - ac[ti])
        coef2 = (1 - ac_prev[ti]) * np.sqrt(1 - betas[ti]) / (1 - ac[ti])
        expected = coef1 * 0.3 + coef2 * -0.7
        assert float(mean[i, 0, 0, 0]) == pytest.approx(expected, rel=1e-4)
        pv = betas[ti] * (1 - ac_prev[ti]) / (1 - ac[ti])
        assert float(var[i, 0, 0, 0]) == pytest.approx(pv, rel=1e-4)


def test_fixed_large_variance_t0_uses_posterior():
    sched = DiscreteNoiseScheduler.create("linear", 100)
    ctx = {"timestep": jnp.array([0, 1])}
    var, logvar = sched.variance_fixed_large(ctx, (2, 1, 1, 1))
    assert float(jnp.exp(logvar[0, 0, 0, 0])) == pytest.approx(
        float(sched.posterior_variance[1]), rel=1e-4
    )
    assert float(jnp.exp(logvar[1, 0, 0, 0])) == pytest.approx(
        float(sched.betas[1]), rel=1e-4
    )


def test_continuous_logsnr_endpoints_and_qsample():
    sched = ContinuousNoiseScheduler.create(
        num_scales=1000, logsnr_schedule="cosine", logsnr_min=-20.0, logsnr_max=20.0
    )
    assert float(sched.logsnr(jnp.array([0.0]))[0]) == pytest.approx(20.0, abs=1e-3)
    assert float(sched.logsnr(jnp.array([1.0]))[0]) == pytest.approx(-20.0, abs=1e-3)
    # At t=0 (max SNR) q_sample ~ x0; at t=1 (min SNR) q_sample ~ noise.
    x0 = jnp.ones((1, 4, 4, 1))
    eps = jnp.full((1, 4, 4, 1), -1.0)
    near_x0 = sched.q_sample(x0, jnp.array([0.0]), eps)
    near_eps = sched.q_sample(x0, jnp.array([1.0]), eps)
    assert float(near_x0[0, 0, 0, 0]) == pytest.approx(1.0, abs=1e-3)
    assert float(near_eps[0, 0, 0, 0]) == pytest.approx(-1.0, abs=1e-3)


def test_continuous_posterior_variance_consistency():
    sched = ContinuousNoiseScheduler.create(num_scales=1000)
    ctx = {
        "logsnr_t": jnp.array([-2.0]),
        "logsnr_s": jnp.array([-1.0]),
    }
    x0 = jnp.zeros((1, 2, 2, 1))
    xt = jnp.ones((1, 2, 2, 1))
    mean, var, logvar = sched.q_posterior(x0, xt, ctx)
    # var = (1 - e^{lt-ls}) * sigmoid(-ls)
    expected = (1 - np.exp(-1.0)) * (1 / (1 + np.exp(-1.0)))
    assert float(var[0, 0, 0, 0]) == pytest.approx(expected, rel=1e-5)
    assert np.all(np.isfinite(np.asarray(mean)))


def test_continuous_x_eps_roundtrip():
    sched = ContinuousNoiseScheduler.create(num_scales=1000)
    rng = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (4, 4, 4, 2))
    eps = jax.random.normal(k2, (4, 4, 4, 2))
    t = jax.random.uniform(k3, (4,), minval=0.05, maxval=0.95)
    z = sched.q_sample(x0, t, eps)
    ctx = {"logsnr_t": sched.logsnr(t)}
    x0_hat = sched.predict_x_from_epsilon(z, eps, ctx)
    # Table quantization of logsnr(t) costs some accuracy; identity holds.
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=5e-2)


def test_rectified_flow_interpolant():
    sched = DiscreteRectifiedFlowNoiseScheduler.create(steps=100, max_time=1.0)
    x0 = jnp.ones((2, 2, 2, 1))
    eps = jnp.zeros((2, 2, 2, 1))
    t = jnp.array([0.25, 0.75])
    x_t = sched.q_sample(x0, t, eps)
    assert float(x_t[0, 0, 0, 0]) == pytest.approx(0.25)
    assert float(x_t[1, 0, 0, 0]) == pytest.approx(0.75)
    # time sampling bounds
    ts, w = sched.sample_random_times(jax.random.PRNGKey(0), 1024)
    assert float(ts.min()) >= sched.epsilon
    assert float(ts.max()) <= sched.max_time
    assert np.all(np.asarray(w) == 1.0)


def test_elementwise_losses():
    p = jnp.array([1.0, 2.0, -3.0])
    t = jnp.array([0.0, 0.0, 0.0])
    np.testing.assert_allclose(elementwise_loss("l2", p, t), [1.0, 4.0, 9.0])
    np.testing.assert_allclose(elementwise_loss("l1", p, t), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(elementwise_loss("huber", p, t), [0.5, 1.5, 2.5])


def test_discrete_logsnr_extension():
    sched = DiscreteNoiseScheduler.create("linear", 1000)
    t = jnp.array([0, 500, 999])
    logsnr = sched.logsnr_from_index(t)
    ac = np.asarray(sched.alphas_cumprod)
    expected = np.log(ac / (1 - ac))[[0, 500, 999]]
    np.testing.assert_allclose(np.asarray(logsnr), expected, rtol=1e-4)
    # monotone decreasing in t
    assert float(logsnr[0]) > float(logsnr[1]) > float(logsnr[2])
