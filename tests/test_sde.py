"""Score-SDE tests: SDE marginals, DSM loss, predictor-corrector scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.diffusion.sde import GaussianDiffusion_SDE
from xdiffusion_tpu.sde.subvpsde import subVPSDE
from xdiffusion_tpu.sde.vpsde import VPSDE

from test_diffusion import tiny_config  # reuse tiny unet score-network block


def tiny_sde_config(continuous=True, predictor="ReverseDiffusionPredictor",
                    corrector="LangevinCorrector", N=1000):
    # N stays at 1000: the discrete beta tables (linspace(beta/N...)) only
    # make sense for large N; tests shorten sampling via num_sampling_steps.
    base = tiny_config()  # borrow the score_network block
    sn = base.to_dict()["diffusion"]["score_network"]
    return DotConfig(
        {
            "target": "xdiffusion.diffusion.sde.GaussianDiffusion_SDE",
            "diffusion": {
                "continuous": continuous,
                "sampling": {
                    "output_channels": 1,
                    "output_spatial_size": 8,
                    "target": "xdiffusion.samplers.pc.PredictorCorrectorSampler",
                    "params": {
                        "predictor": {
                            "target": f"xdiffusion.samplers.pc.{predictor}",
                            "params": {"probability_flow": False},
                        },
                        "corrector": {
                            "target": f"xdiffusion.samplers.pc.{corrector}",
                            "params": (
                                {"snr": 0.16, "n_steps": 1}
                                if corrector == "LangevinCorrector"
                                else {}
                            ),
                        },
                    },
                },
                "sde": {
                    "target": "xdiffusion.sde.subvpsde.subVPSDE",
                    "params": {"beta_min": 0.1, "beta_max": 20, "N": N},
                },
                "score_network": sn,
            },
            "data": {"image_size": 8, "num_channels": 1, "num_classes": 10},
        }
    )


def test_vpsde_marginal_limits():
    sde = VPSDE(N=100)
    x = jnp.ones((2, 4, 4, 1))
    mean0, std0 = sde.marginal_prob(x, jnp.array([1e-5, 1e-5]))
    np.testing.assert_allclose(np.asarray(mean0), np.asarray(x), atol=1e-3)
    assert float(std0[0]) < 0.01
    mean1, std1 = sde.marginal_prob(x, jnp.array([1.0, 1.0]))
    # At t=T the signal is mostly destroyed, std near 1.
    assert float(jnp.abs(mean1).max()) < 0.05
    assert float(std1[0]) > 0.99


def test_vpsde_discretize_matches_betas():
    sde = VPSDE(N=10)
    x = jnp.ones((1, 2, 2, 1))
    f, g = sde.discretize(x, jnp.array([1.0]))
    beta_last = float(sde.discrete_betas[-1])
    assert float(g[0]) == pytest.approx(np.sqrt(beta_last), rel=1e-5)


def test_subvpsde_diffusion_discounted():
    sde = subVPSDE(N=100)
    x = jnp.zeros((1, 2, 2, 1))
    _, diff_small = sde.sde(x, jnp.array([1e-4]))
    _, diff_late = sde.sde(x, jnp.array([0.9]))
    # Early diffusion is heavily discounted vs VP.
    assert float(diff_small[0]) < 0.01
    assert float(diff_late[0]) > 1.0


def test_sde_loss_and_grads():
    model = GaussianDiffusion_SDE(tiny_sde_config())
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 1))

    @jax.jit
    def loss_fn(p, r):
        loss, _ = model.loss_on_batch(p, r, images, {})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert all(
        bool(jnp.all(jnp.isfinite(g))) for g in jax.tree_util.tree_leaves(grads)
    )


@pytest.mark.parametrize(
    "predictor,corrector",
    [
        ("ReverseDiffusionPredictor", "LangevinCorrector"),
        ("EulerMaruyamaPredictor", "NoneCorrector"),
        ("AncestralSamplingPredictor", "NoneCorrector"),
    ],
)
def test_pc_sampling_scan(predictor, corrector):
    cfg = tiny_sde_config(predictor=predictor, corrector=corrector)
    if predictor == "AncestralSamplingPredictor":
        # Ancestral predictor needs the VP discrete beta tables.
        cfg.to_dict()["diffusion"]["sde"] = {
            "target": "xdiffusion.sde.vpsde.VPSDE",
            "params": {"beta_min": 0.1, "beta_max": 20, "N": 1000},
        }
    model = GaussianDiffusion_SDE(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    samples = model.sample(
        params, jax.random.PRNGKey(1), num_samples=2, num_sampling_steps=8
    )
    assert samples.shape == (2, 8, 8, 1)
    s = np.asarray(samples)
    assert np.all(np.isfinite(s)) and s.min() >= 0.0 and s.max() <= 1.0


def test_reverse_sde_drift_and_discretize():
    """reverse(score_fn) implements Score-SDE eq. 6 (SDE) / eq. 13 (ODE)
    against the forward coefficients (reference sde/base.py:98-155)."""
    from xdiffusion_tpu.sde.vpsde import VPSDE

    sde = VPSDE(N=100)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    t = jnp.array([0.3, 0.7])

    def score_fn(x, t):
        return -0.5 * x  # arbitrary smooth score

    f_fwd, g_fwd = sde.sde(x, t)
    bcast = lambda c: c.reshape(c.shape + (1,) * (x.ndim - c.ndim))

    rev = sde.reverse(score_fn)
    f_rev, g_rev = rev.sde(x, t)
    np.testing.assert_allclose(
        np.asarray(f_rev),
        np.asarray(f_fwd - bcast(g_fwd) ** 2 * score_fn(x, t)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_fwd), rtol=1e-6)
    assert rev.N == sde.N and rev.T == sde.T

    ode = sde.reverse(score_fn, probability_flow=True)
    f_ode, g_ode = ode.sde(x, t)
    np.testing.assert_allclose(
        np.asarray(f_ode),
        np.asarray(f_fwd - 0.5 * bcast(g_fwd) ** 2 * score_fn(x, t)),
        rtol=1e-6,
    )
    assert float(jnp.max(jnp.abs(g_ode))) == 0.0

    # Discretized rules follow the same construction.
    fd, gd = sde.discretize(x, t)
    fr, gr = rev.discretize(x, t)
    np.testing.assert_allclose(
        np.asarray(fr),
        np.asarray(fd - bcast(gd) ** 2 * score_fn(x, t)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gd), rtol=1e-6)

    # Marginals delegate to the forward process.
    m1, s1 = sde.marginal_prob(x, t)
    m2, s2 = rev.marginal_prob(x, t)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
