"""Golden network parity for the EDM backbones: reference SongUNet /
DhariwalUNet (score_networks/edm.py:18-399) vs ours on identical
imported weights and inputs."""

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import import_reference


def _ref_edm():
    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    import xdiffusion.score_networks.edm as ref_edm

    return ref_edm


def _import_and_compare(ref_net, ours, arch, x, noise, class_labels=None,
                        ref_labels=None, atol=2e-4):
    import torch

    import jax

    from tests.reference_helpers import randomize_zero_init
    from xdiffusion_tpu.importers.edm import import_edm_unet_params

    # EDM zero-inits its output convs (reference edm.py `init_zero`);
    # randomize so the comparison is sensitive to every layer.
    torch_sd = randomize_zero_init(ref_net.state_dict())
    ref_net.load_state_dict(torch_sd)
    sd = {k: v.detach().numpy() for k, v in torch_sd.items()}
    variables = ours.init(
        jax.random.PRNGKey(0),
        x.transpose(0, 2, 3, 1),
        noise,
        class_labels=class_labels,
    )
    variables = import_edm_unet_params(variables, sd, arch=arch)

    with torch.no_grad():
        ref_out = ref_net(
            torch.from_numpy(x),
            torch.from_numpy(noise),
            None if ref_labels is None else torch.from_numpy(ref_labels),
        ).numpy()
    our_out = ours.apply(
        variables,
        x.transpose(0, 2, 3, 1),
        noise,
        class_labels=class_labels,
    )
    our_out = np.transpose(np.asarray(our_out), (0, 3, 1, 2))
    np.testing.assert_allclose(our_out, ref_out, atol=atol, rtol=2e-3)


def test_song_unet_ddpmpp_matches_reference():
    """The shipped edm.yaml backbone: positional embedding, standard
    encoder, filter [1,1] (configs/image/mnist/edm.yaml)."""
    import torch

    ref_edm = _ref_edm()
    from xdiffusion_tpu.score_networks.edm import SongUNet

    params = dict(
        img_resolution=32, in_channels=1, out_channels=1, label_dim=0,
        augment_dim=0, model_channels=128, channel_mult=[2, 2, 2],
        channel_mult_emb=4, num_blocks=4, attn_resolutions=[16],
        dropout=0.1, label_dropout=0, embedding_type="positional",
        channel_mult_noise=1, encoder_type="standard",
        decoder_type="standard", resample_filter=[1, 1],
    )
    torch.manual_seed(0)
    ref = ref_edm.SongUNet(**params).eval()
    ours = SongUNet(**params)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    noise = rng.standard_normal((2,), dtype=np.float32)
    _import_and_compare(ref, ours, "song", x, noise)


def test_song_unet_ncsnpp_matches_reference():
    """NCSN++ design point: fourier embedding, residual encoder with the
    fused-downsample aux projections, filter [1,3,3,1]
    (configs/image/mnist/edm_ncsnpp.yaml)."""
    import torch

    ref_edm = _ref_edm()
    from xdiffusion_tpu.score_networks.edm import SongUNet

    params = dict(
        img_resolution=32, in_channels=1, out_channels=1, label_dim=0,
        augment_dim=0, model_channels=32, channel_mult=[1, 2, 2],
        channel_mult_emb=4, num_blocks=2, attn_resolutions=[16],
        dropout=0.0, label_dropout=0, embedding_type="fourier",
        channel_mult_noise=2, encoder_type="residual",
        decoder_type="standard", resample_filter=[1, 3, 3, 1],
    )
    torch.manual_seed(1)
    ref = ref_edm.SongUNet(**params).eval()
    ours = SongUNet(**params)

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    noise = rng.standard_normal((2,), dtype=np.float32)
    _import_and_compare(ref, ours, "song", x, noise)


def test_dhariwal_unet_matches_reference():
    """ADM backbone with class conditioning (edm_adm.yaml shape, shrunk
    widths; adaptive scale-shift, multi-head attention, filter-only
    resampling skips)."""
    import torch

    ref_edm = _ref_edm()
    from xdiffusion_tpu.score_networks.edm import DhariwalUNet

    params = dict(
        img_resolution=32, in_channels=1, out_channels=1, label_dim=10,
        augment_dim=0, model_channels=64, channel_mult=[1, 2],
        channel_mult_emb=4, num_blocks=2, attn_resolutions=[16, 8],
        dropout=0.0, label_dropout=0,
    )
    torch.manual_seed(2)
    ref = ref_edm.DhariwalUNet(**params).eval()
    ours = DhariwalUNet(**params)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    noise = rng.standard_normal((2,), dtype=np.float32)
    classes = np.array([3, 8])
    one_hot = np.eye(10, dtype=np.float32)[classes]
    _import_and_compare(
        ref, ours, "adm", x, noise,
        class_labels=classes.astype(np.int32), ref_labels=one_hot,
    )


def test_edm_precond_end_to_end_matches_reference():
    """Through the EDMPrecond wrapper on the SHIPPED edm.yaml: D(x, sigma)
    = c_skip*x + c_out*F(c_in*x, c_noise) on identical weights
    (reference score_networks/edm.py:635-697)."""
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.utils import instantiate_from_config as ref_instantiate
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.importers import import_score_network_params
    from xdiffusion_tpu.config import instantiate_from_config

    config_path = "/root/reference/configs/image/mnist/edm.yaml"
    torch.manual_seed(3)
    ref_cfg = ref_load_yaml(config_path)
    ref_net = ref_instantiate(
        ref_cfg.diffusion.score_network.to_dict()
    ).eval()

    cfg = load_yaml(config_path)
    precond = instantiate_from_config(cfg.diffusion.score_network.to_dict())
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    sigma = np.array([0.3, 7.5], dtype=np.float32)
    params = precond.init(
        jax.random.PRNGKey(0), x.transpose(0, 2, 3, 1), sigma
    )
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    params = import_score_network_params(cfg, params, sd)

    with torch.no_grad():
        ref_out = ref_net(
            torch.from_numpy(x), torch.from_numpy(sigma), None
        ).numpy()
    our_out = precond.apply(params, x.transpose(0, 2, 3, 1), sigma)
    our_out = np.transpose(np.asarray(our_out), (0, 3, 1, 2))
    np.testing.assert_allclose(our_out, ref_out, atol=5e-4, rtol=5e-3)


def test_edm_heun_trajectory_matches_reference():
    """Full EDM sampling parity on the shipped edm.yaml: the 6-step
    deterministic Heun trajectory (S_churn=0) from identical latents and
    imported weights matches the reference StochasticSampler
    (reference samplers/edm.py:36-137)."""
    import types

    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.samplers.edm import StochasticSampler as RefSampler
    from xdiffusion.utils import instantiate_from_config as ref_instantiate
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.edm import GaussianDiffusion_EDM
    from xdiffusion_tpu.importers import import_score_network_params
    from xdiffusion_tpu.samplers.edm import StochasticSampler
    from xdiffusion_tpu.utils import unnormalize_to_zero_to_one

    config_path = "/root/reference/configs/image/mnist/edm.yaml"
    torch.manual_seed(5)
    ref_cfg = ref_load_yaml(config_path)
    ref_net = ref_instantiate(
        ref_cfg.diffusion.score_network.to_dict()
    ).eval()
    from tests.reference_helpers import randomize_zero_init

    torch_sd = randomize_zero_init(ref_net.state_dict())
    ref_net.load_state_dict(torch_sd)

    cfg = load_yaml(config_path)
    model = GaussianDiffusion_EDM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in torch_sd.items()}
    )

    rng = np.random.default_rng(21)
    latents = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)

    kwargs = dict(num_steps=6, S_churn=0.0)
    with torch.no_grad():
        ref_x0 = RefSampler(**kwargs).p_sample_loop(
            types.SimpleNamespace(_score_network=ref_net),
            torch.from_numpy(latents),
            class_labels=None,
        )
    ref_samples = np.asarray(
        unnormalize_to_zero_to_one(
            np.transpose(ref_x0.to(torch.float32).numpy(), (0, 2, 3, 1))
        )
    )

    our_samples = np.asarray(
        model.sample(
            params,
            jax.random.PRNGKey(1),
            num_samples=2,
            sampler=StochasticSampler(**kwargs),
            initial_noise=np.transpose(latents, (0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(our_samples, ref_samples, atol=1e-3, rtol=5e-3)


def test_onestep_consistency_sampling_matches_reference():
    """One-step consistency sampling parity on the shipped
    consistency_model.yaml: x0 = clamp(f(latents*sigma_max, sigma_max))
    from identical latents and imported EDMPrecond/SongUNet weights
    (reference samplers/consistency.py:11-85)."""
    import types

    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.samplers.consistency import (
        OneStepConsistencySampler as RefSampler,
    )
    from xdiffusion.utils import instantiate_from_config as ref_instantiate
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from tests.reference_helpers import randomize_zero_init
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.consistency import (
        GaussianDiffusion_ConsistencyModel,
    )
    from xdiffusion_tpu.importers import import_score_network_params
    from xdiffusion_tpu.samplers.consistency import OneStepConsistencySampler
    from xdiffusion_tpu.utils import unnormalize_to_zero_to_one

    config_path = "/root/reference/configs/image/mnist/consistency_model.yaml"
    torch.manual_seed(9)
    ref_cfg = ref_load_yaml(config_path)
    ref_net = ref_instantiate(
        ref_cfg.diffusion.score_network.to_dict()
    ).eval()
    torch_sd = randomize_zero_init(ref_net.state_dict())
    ref_net.load_state_dict(torch_sd)

    cfg = load_yaml(config_path)
    model = GaussianDiffusion_ConsistencyModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    score = import_score_network_params(
        cfg,
        params["score"],
        {k: v.detach().numpy() for k, v in torch_sd.items()},
    )
    params = dict(params, score=score)
    if "ema" in params:
        params["ema"] = jax.tree_util.tree_map(lambda a: a, score)

    rng = np.random.default_rng(33)
    latents = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)

    with torch.no_grad():
        ref_x0 = RefSampler(
            sigma_min=0.002, sigma_max=80.0, rho=7.0, clip_denoised=True
        ).p_sample_loop(
            types.SimpleNamespace(
                _score_network=ref_net, _score_network_ema=None
            ),
            torch.from_numpy(latents),
        )
    ref_samples = np.asarray(
        unnormalize_to_zero_to_one(
            np.transpose(ref_x0.numpy(), (0, 2, 3, 1))
        )
    )

    our_samples = np.asarray(
        model.sample(
            params,
            jax.random.PRNGKey(1),
            num_samples=2,
            sampler=OneStepConsistencySampler(),
            initial_noise=np.transpose(latents, (0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(our_samples, ref_samples, atol=1e-3, rtol=5e-3)


@pytest.mark.parametrize(
    "point",
    [
        dict(solver="euler", discretization="vp", schedule="vp",
             scaling="vp"),
        dict(solver="heun", discretization="edm", schedule="linear",
             scaling="none"),
    ],
)
def test_generalized_sampler_trajectory_matches_reference(point):
    """Generalized ablation-sampler parity (reference samplers/
    edm.py:139-338): deterministic (S_churn=0) VP/Euler and EDM/Heun
    design points produce the same trajectory from identical latents
    and imported weights on the shipped edm.yaml."""
    import types

    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.samplers.edm import (
        GeneralizedStochasticSampler as RefSampler,
    )
    from xdiffusion.utils import instantiate_from_config as ref_instantiate
    from xdiffusion.utils import load_yaml as ref_load_yaml

    import jax

    from tests.reference_helpers import randomize_zero_init
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.edm import GaussianDiffusion_EDM
    from xdiffusion_tpu.importers import import_score_network_params
    from xdiffusion_tpu.samplers.edm import GeneralizedStochasticSampler
    from xdiffusion_tpu.utils import unnormalize_to_zero_to_one

    config_path = "/root/reference/configs/image/mnist/edm.yaml"
    torch.manual_seed(13)
    ref_cfg = ref_load_yaml(config_path)
    ref_net = ref_instantiate(
        ref_cfg.diffusion.score_network.to_dict()
    ).eval()
    torch_sd = randomize_zero_init(ref_net.state_dict())
    ref_net.load_state_dict(torch_sd)

    cfg = load_yaml(config_path)
    model = GaussianDiffusion_EDM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = import_score_network_params(
        cfg, params, {k: v.detach().numpy() for k, v in torch_sd.items()}
    )

    rng = np.random.default_rng(55)
    latents = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)
    kwargs = dict(num_steps=4, S_churn=0.0, **point)

    with torch.no_grad():
        ref_x0 = RefSampler(**kwargs).p_sample_loop(
            types.SimpleNamespace(_score_network=ref_net),
            torch.from_numpy(latents),
            class_labels=None,
        )
    ref_samples = np.asarray(
        unnormalize_to_zero_to_one(
            np.transpose(ref_x0.to(torch.float32).numpy(), (0, 2, 3, 1))
        )
    )

    our_samples = np.asarray(
        model.sample(
            params,
            jax.random.PRNGKey(1),
            num_samples=2,
            sampler=GeneralizedStochasticSampler(**kwargs),
            initial_noise=np.transpose(latents, (0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(our_samples, ref_samples, atol=1e-3, rtol=5e-3)
