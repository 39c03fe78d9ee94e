"""Training-loss golden parity against the reference torch stack.

With identical imported weights, an identical image batch, injected
timesteps and epsilon noise, and dropout disabled in both stacks, the
scalar training objective must match the reference's `loss_on_batch`
(reference diffusion/ddpm.py:145-338). This validates the pieces that
network forward parity alone cannot: `q_sample`, the prediction-target
computation (epsilon / v / rectified-flow), the Improved-DDPM hybrid
VLB term (incl. the t=0 decoder-NLL branch), uniform loss weights, and
the `b ... -> b` mean reduction.
"""

import os

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import import_reference, randomize_zero_init

CONFIGS = "/root/reference/configs/image/mnist"
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

# (config path, timesteps) — discrete configs use int indices (t=0
# included for the learned-sigma case: that row takes the VLB's
# discretized-Gaussian decoder-NLL branch, reference ddpm.py:300-327);
# continuous configs use float times in (0, 1).
CASES = {
    "epsilon_discrete": (
        f"{CONFIGS}/ddpm_32x32_epsilon_discrete.yaml",
        np.array([17, 3, 512, 999], dtype=np.int64),
    ),
    "learned_sigma_hybrid": (
        f"{CONFIGS}/ddpm_unconditional_learned_sigma.yaml",
        np.array([0, 3, 512, 999], dtype=np.int64),
    ),
    "v_continuous": (
        f"{CONFIGS}/ddpm_32x32_v_continuous.yaml",
        np.array([0.02, 0.25, 0.6, 0.97], dtype=np.float32),
    ),
    "rectified_flow": (
        f"{FIXTURES}/rf_trajectory_parity.yaml",
        np.array([1, 200, 600, 980], dtype=np.int64),
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_training_loss_matches_reference(case, monkeypatch):
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.diffusion.ddpm import GaussianDiffusion_DDPM as RefDDPM
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.importers import import_score_network_params

    config, t_np = CASES[case]
    torch.manual_seed(11)
    ref_model = RefDDPM(ref_load_yaml(config))
    sd = randomize_zero_init(ref_model._score_network.state_dict())
    ref_model._score_network.load_state_dict(sd)
    # eval() kills torch dropout; our side passes deterministic=True.
    ref_model.eval()

    b = len(t_np)
    rng = np.random.default_rng(23)
    net_params = ref_model._config.diffusion.score_network.params
    side = net_params.input_spatial_size
    images = rng.uniform(
        0.0, 1.0, size=(b, net_params.input_channels, side, side)
    ).astype(np.float32)
    eps = rng.standard_normal(images.shape).astype(np.float32)

    # Pin the reference's internal randomness: timesteps come from the
    # scheduler's sample_random_times (uniform weights), epsilon from
    # torch.randn_like (reference ddpm.py:199-210).
    t_torch = torch.from_numpy(t_np)
    w_torch = torch.ones(b)
    monkeypatch.setattr(
        ref_model._noise_scheduler,
        "sample_random_times",
        lambda batch_size, device: (t_torch, w_torch),
    )
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.from_numpy(eps))

    if case == "learned_sigma_hybrid":
        # The reference snapshot's VLB helper crashes as-shipped:
        # ddpm.py:1021 unpacks 3 values from
        # AncestralSampler.p_mean_variance, which returns 4
        # (samplers/ancestral.py:192) — learned-sigma training is broken
        # in the reference. Patch the arity at the boundary so the test
        # can compare against the reference's *intended* hybrid VLB.
        from xdiffusion.samplers.ancestral import AncestralSampler

        orig_pmv = AncestralSampler.p_mean_variance
        monkeypatch.setattr(
            AncestralSampler,
            "p_mean_variance",
            lambda self, *a, **k: orig_pmv(self, *a, **k)[:3],
        )

    # The RF fixture's Flux net consumes text embeddings directly.
    ref_ctx, our_ctx = {}, {}
    if case == "rectified_flow":
        t5 = rng.standard_normal((b, 7, 48)).astype(np.float32)
        clip = rng.standard_normal((b, 32)).astype(np.float32)
        ref_ctx = {
            "t5_text_embeddings": torch.from_numpy(t5),
            "clip_text_embeddings": torch.from_numpy(clip),
        }
        our_ctx = {
            "t5_text_embeddings": t5,
            "clip_text_embeddings": clip,
        }

    with torch.no_grad():
        ref_losses = ref_model.loss_on_batch(
            torch.from_numpy(images), context=ref_ctx
        )

    cfg = load_yaml(config)
    ours = GaussianDiffusion_DDPM(cfg)
    if case == "rectified_flow":
        import jax.numpy as jnp

        init_ctx = {
            "timestep": jnp.zeros((b,), jnp.float32),
            "t5_text_embeddings": jnp.asarray(our_ctx["t5_text_embeddings"]),
            "clip_text_embeddings": jnp.asarray(
                our_ctx["clip_text_embeddings"]
            ),
        }
        params = jax.jit(ours._score_network.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((b, side, side, net_params.input_channels)),
            init_ctx,
        )
    else:
        params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in sd.items()}
    )

    t_ours = (
        t_np.astype(np.int32) if np.issubdtype(t_np.dtype, np.integer)
        else t_np
    )
    with jax.default_matmul_precision("highest"):
        total, metrics = ours.loss_on_batch(
            params,
            jax.random.PRNGKey(1),
            np.transpose(images, (0, 2, 3, 1)),
            context=our_ctx,
            timesteps=t_ours,
            noise=np.transpose(eps, (0, 2, 3, 1)),
            deterministic=True,
        )

    np.testing.assert_allclose(
        float(total), float(ref_losses["loss"]), rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["mse_loss"]),
        float(ref_losses["mse_loss"]),
        rtol=2e-3,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        float(metrics["vb_loss"]),
        float(ref_losses["vb_loss"]),
        rtol=5e-3,
        atol=1e-6,
    )


@pytest.mark.parametrize(
    "case", ["epsilon_discrete", "learned_sigma_hybrid"]
)
def test_training_loss_input_gradients_match_reference(case, monkeypatch):
    """d(loss)/d(images), elementwise, both stacks. Unlike parameter
    gradients this needs no layout mapping (only an NCHW<->NHWC
    transpose), and it catches wrong stop-gradient placement — e.g. the
    detached epsilon path feeding the hybrid VLB term
    (reference ddpm.py:310) — that equal loss VALUES cannot."""
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.diffusion.ddpm import GaussianDiffusion_DDPM as RefDDPM
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.importers import import_score_network_params

    config, t_np = CASES[case]
    torch.manual_seed(11)
    ref_model = RefDDPM(ref_load_yaml(config))
    sd = randomize_zero_init(ref_model._score_network.state_dict())
    ref_model._score_network.load_state_dict(sd)
    ref_model.eval()

    b = len(t_np)
    rng = np.random.default_rng(29)
    net_params = ref_model._config.diffusion.score_network.params
    side = net_params.input_spatial_size
    images = rng.uniform(
        0.0, 1.0, size=(b, net_params.input_channels, side, side)
    ).astype(np.float32)
    eps = rng.standard_normal(images.shape).astype(np.float32)

    t_torch = torch.from_numpy(t_np)
    w_torch = torch.ones(b)
    monkeypatch.setattr(
        ref_model._noise_scheduler,
        "sample_random_times",
        lambda batch_size, device: (t_torch, w_torch),
    )
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.from_numpy(eps))
    if case == "learned_sigma_hybrid":
        from xdiffusion.samplers.ancestral import AncestralSampler

        orig_pmv = AncestralSampler.p_mean_variance
        monkeypatch.setattr(
            AncestralSampler,
            "p_mean_variance",
            lambda self, *a, **k: orig_pmv(self, *a, **k)[:3],
        )

    images_torch = torch.from_numpy(images).requires_grad_(True)
    ref_losses = ref_model.loss_on_batch(images_torch, context={})
    ref_losses["loss"].backward()
    ref_grad = images_torch.grad.detach().numpy()

    cfg = load_yaml(config)
    ours = GaussianDiffusion_DDPM(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in sd.items()}
    )

    import jax.numpy as jnp

    def jnp_transpose(x):
        return jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))

    def loss_of_images(imgs_nhwc):
        total, _ = ours.loss_on_batch(
            params,
            jax.random.PRNGKey(1),
            imgs_nhwc,
            context={},
            timesteps=t_np.astype(np.int32),
            noise=jnp_transpose(eps),
            deterministic=True,
        )
        return total

    with jax.default_matmul_precision("highest"):
        our_grad = jax.grad(loss_of_images)(jnp_transpose(images))
    our_grad = np.transpose(np.asarray(our_grad), (0, 3, 1, 2))

    np.testing.assert_allclose(our_grad, ref_grad, atol=5e-6, rtol=5e-3)


def test_parameter_gradients_match_reference(monkeypatch):
    """Full parameter-gradient parity on the flagship UNet: identical
    weights / batch / timesteps / noise, torch autograd per state_dict
    key vs our jax.grad tree exported through the flax->torch layout
    mapping (importers/export_torch.py — purely permutation/transpose
    based, hence equally valid for gradients). This is one optimizer
    call short of full train-step parity and covers every trainable
    tensor in the network."""
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.diffusion.ddpm import GaussianDiffusion_DDPM as RefDDPM
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.importers import import_score_network_params
    from xdiffusion_tpu.importers.export_torch import export_unet_params

    config, _ = CASES["epsilon_discrete"]
    t_np = np.array([17, 890], dtype=np.int64)
    torch.manual_seed(11)
    ref_model = RefDDPM(ref_load_yaml(config))
    sd = randomize_zero_init(ref_model._score_network.state_dict())
    ref_model._score_network.load_state_dict(sd)
    ref_model.eval()

    b = len(t_np)
    rng = np.random.default_rng(31)
    images = rng.uniform(0.0, 1.0, size=(b, 1, 32, 32)).astype(np.float32)
    eps = rng.standard_normal(images.shape).astype(np.float32)

    t_torch = torch.from_numpy(t_np)
    w_torch = torch.ones(b)
    monkeypatch.setattr(
        ref_model._noise_scheduler,
        "sample_random_times",
        lambda batch_size, device: (t_torch, w_torch),
    )
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.from_numpy(eps))

    ref_model.zero_grad()
    ref_losses = ref_model.loss_on_batch(torch.from_numpy(images), context={})
    ref_losses["loss"].backward()
    ref_grads = {
        k: p.grad.detach().numpy()
        for k, p in ref_model._score_network.named_parameters()
        if p.grad is not None
    }

    cfg = load_yaml(config)
    ours = GaussianDiffusion_DDPM(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in sd.items()}
    )

    import jax.numpy as jnp

    def loss_of_params(p):
        total, _ = ours.loss_on_batch(
            p,
            jax.random.PRNGKey(1),
            jnp.transpose(jnp.asarray(images), (0, 2, 3, 1)),
            context={},
            timesteps=t_np.astype(np.int32),
            noise=jnp.transpose(jnp.asarray(eps), (0, 2, 3, 1)),
            deterministic=True,
        )
        return total

    with jax.default_matmul_precision("highest"):
        our_grads = jax.grad(loss_of_params)(params)
    exported = export_unet_params(our_grads)

    checked = 0
    for key, ref_g in ref_grads.items():
        our_g = exported.get(key)
        if our_g is None:
            # The reference registers the shared projections ModuleDict
            # under each context-transformer head; the export emits the
            # canonical `_projections.` name only.
            idx = key.find("_projections.")
            if idx > 0:
                our_g = exported.get(key[idx:])
        assert our_g is not None, f"no exported gradient for {key}"
        np.testing.assert_allclose(
            our_g, ref_g, atol=2e-6, rtol=5e-3, err_msg=key
        )
        checked += 1
    assert checked == len(ref_grads) and checked > 100


# EDM objective parity: config -> (yaml, loss family). Covers all three
# reference loss classes (diffusion/edm.py:264-345) and both EDM
# backbones (SongUNet via ddpmpp/ncsnpp, DhariwalUNet via adm).
EDM_CASES = {
    "edm_lognormal": ("edm.yaml", "edm"),
    "edm_vp_ddpmpp": ("edm_ddpmpp.yaml", "vp"),
    "edm_ve_ncsnpp": ("edm_ncsnpp.yaml", "ve"),
    "edm_vp_adm": ("edm_adm.yaml", "vp"),
}


@pytest.mark.parametrize("case", sorted(EDM_CASES))
def test_edm_training_loss_matches_reference(case, monkeypatch):
    """EDM-family objective parity: identical imported weights, injected
    sigma draw and unit noise, dropout off; the weighted denoiser MSE
    must match the reference loss classes exactly
    (reference diffusion/edm.py:47-57, 264-345)."""
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.diffusion.edm import GaussianDiffusion_EDM as RefEDM
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.edm import GaussianDiffusion_EDM
    from xdiffusion_tpu.importers import import_score_network_params

    yaml_name, family = EDM_CASES[case]
    config = f"{CONFIGS}/{yaml_name}"
    torch.manual_seed(7)
    ref_cfg = ref_load_yaml(config)
    if case == "edm_vp_adm":
        # The reference's own edm_adm.yaml passes five SongUNet-only
        # arguments to DhariwalUNet, which accepts none of them
        # (score_networks/edm.py:249-265) — the config cannot instantiate
        # as-shipped. Drop the stray keys to build the intended model.
        adm_params = (
            ref_cfg.diffusion.score_network.params.model.params.to_dict()
        )
        for stray in (
            "embedding_type",
            "channel_mult_noise",
            "encoder_type",
            "decoder_type",
            "resample_filter",
        ):
            adm_params.pop(stray, None)
    ref_model = RefEDM(ref_cfg)
    sd = randomize_zero_init(ref_model._score_network.state_dict())
    ref_model._score_network.load_state_dict(sd)
    ref_model.eval()

    b = 4
    rng = np.random.default_rng(37)
    images = rng.uniform(0.0, 1.0, size=(b, 1, 32, 32)).astype(np.float32)
    unit = rng.standard_normal(images.shape).astype(np.float32)
    if family == "edm":
        draw = rng.standard_normal((b, 1, 1, 1)).astype(np.float32)
    else:
        draw = rng.uniform(0.05, 0.95, size=(b, 1, 1, 1)).astype(np.float32)

    # Pin the loss-internal draws (reference diffusion/edm.py:277,305,330:
    # torch.rand / torch.randn for the level, torch.randn_like for the
    # noise).
    monkeypatch.setattr(
        torch, "randn", lambda *a, **k: torch.from_numpy(draw)
    )
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.from_numpy(draw))
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.from_numpy(unit))

    with torch.no_grad():
        ref_loss = float(
            ref_model.loss_on_batch(torch.from_numpy(images), context={})[
                "loss"
            ]
        )

    cfg = load_yaml(config)
    ours = GaussianDiffusion_EDM(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in sd.items()}
    )

    # Reproduce the reference's sigma from the pinned draw with each
    # family's published mapping.
    d = draw.reshape(b).astype(np.float64)
    lp = cfg.diffusion.loss.params
    if family == "edm":
        sigma = np.exp(d * lp.P_std + lp.P_mean)
    elif family == "vp":
        t = 1.0 + d * (lp.epsilon_t - 1.0)
        sigma = np.sqrt(
            np.exp(0.5 * lp.beta_d * t**2 + lp.beta_min * t) - 1.0
        )
    else:
        sigma = lp.sigma_min * (lp.sigma_max / lp.sigma_min) ** d

    with jax.default_matmul_precision("highest"):
        total, _ = ours.loss_on_batch(
            params,
            jax.random.PRNGKey(1),
            np.transpose(images, (0, 2, 3, 1)),
            context={},
            sigma=sigma.astype(np.float32),
            noise=np.transpose(unit, (0, 2, 3, 1)),
            deterministic=True,
        )

    np.testing.assert_allclose(float(total), ref_loss, rtol=2e-3, atol=1e-5)
