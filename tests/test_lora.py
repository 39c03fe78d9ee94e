"""LoRA tests: injection, zero-init identity, training-path gradients,
rectified-flow end-to-end with LoRA applied."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu import lora
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM

from test_diffusion import tiny_config


def rf_config():
    cfg = tiny_config().to_dict()
    cfg["diffusion"]["parameterization"] = "rectified_flow"
    cfg["diffusion"]["noise_scheduler"] = {
        "target": "xdiffusion.scheduler.DiscreteRectifiedFlowNoiseScheduler",
        "params": {"steps": 8, "max_time": 1.0, "distribution": "uniform-clipped"},
    }
    cfg["diffusion"]["sde"] = {
        "target": "xdiffusion.sde.rectified_flow.RectifiedFlow",
        "params": {"N": 8, "T": 1.0},
    }
    cfg["diffusion"]["sampling"]["target"] = (
        "xdiffusion.samplers.rectified_flow.AncestralSampler"
    )
    from xdiffusion_tpu.config import DotConfig

    return DotConfig(cfg)


def test_lora_inject_and_identity_at_init():
    model = GaussianDiffusion_DDPM(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    l = lora.inject_trainable_lora(params, jax.random.PRNGKey(1), r=4)
    assert len(l["weights"]) > 0
    assert lora.lora_param_count(l) > 0
    # up=0 -> adapted params identical to base.
    adapted = lora.apply_lora(params, l)
    for a, b in zip(
        jax.tree_util.tree_leaves(adapted), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_gradients_flow_only_through_lora():
    model = GaussianDiffusion_DDPM(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    l = lora.inject_trainable_lora(params, jax.random.PRNGKey(1), r=2)
    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 1))

    @jax.jit
    def loss_fn(lora_weights, rng):
        full = dict(l)
        full["weights"] = lora_weights
        eff = lora.apply_lora(params, full)
        loss, _ = model.loss_on_batch(eff, rng, images, {})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(
        l["weights"], jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(loss))
    # The "down" factors get gradient through up only after up != 0; the
    # "up" factors must receive nonzero gradient immediately.
    up_norm = sum(
        float(jnp.sum(jnp.abs(w["up"]))) for w in grads.values()
    )
    assert up_norm > 0.0


def test_lora_save_load_roundtrip(tmp_path):
    model = GaussianDiffusion_DDPM(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    l = lora.inject_trainable_lora(params, jax.random.PRNGKey(1), r=4)
    p = str(tmp_path / "lora.pkl")
    lora.save_lora_weights(l, p)
    l2 = lora.load_lora_weights(p)
    assert l2["rank"] == 4
    assert set(l2["weights"].keys()) == set(l["weights"].keys())


def test_rectified_flow_train_and_sample():
    model = GaussianDiffusion_DDPM(rf_config())
    params = model.init_params(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 1))
    loss, _ = jax.jit(lambda p, r: model.loss_on_batch(p, r, images, {}))(
        params, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    samples = model.sample(
        params, jax.random.PRNGKey(3), num_samples=2, num_sampling_steps=8
    )
    assert samples.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(samples)))
