"""HunyuanVideo causal-3D VAE golden parity against the torch reference.

With identical imported weights, encode moments and decode output must
match the reference `HunyuanCausal3DVAE` (reference autoencoders/
hunyuan.py:34-1545): replicate-padded causal convs, the spatial-then-
temporal stride plan, the frame-causal single-head mid-block attention,
first-frame-aware nearest upsampling, and the 1x1 quant convs. Two
cases cover per-channel and uniform (broadcast) log-variance heads and
mid-attention on/off.

Value convention: like the LTX VAE, the reference normalizes [0,1]
pixels internally and clamps to [-1,1] on decode; the test feeds ours
`2x-1` and clips before comparing.
"""

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import import_reference

_BASE = {
    "in_channels": 1,
    "out_channels": 1,
    "act_fn": "silu",
    "block_out_channels": [32, 64, 64],
    "down_block_types": ["DownEncoderBlockCausal3D"] * 3,
    "up_block_types": ["UpDecoderBlockCausal3D"] * 3,
    "latent_channels": 4,
    "layers_per_block": 1,
    "norm_num_groups": 32,
    "sample_size": 32,
    "sample_tsize": 9,
    "scaling_factor": 1.0,
    "time_compression_ratio": 4,
    "spatial_compression_ratio": 4,
}

CASES = {
    "per_channel": {"latent_logvar": "per_channel", "mid_block_add_attention": True},
    "uniform": {"latent_logvar": "uniform", "mid_block_add_attention": False},
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_hunyuan_vae_matches_reference(case):
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.autoencoders.hunyuan import HunyuanCausal3DVAE as RefVAE
    from xdiffusion.utils import DotConfig as RefDotConfig

    spec = {**_BASE, **CASES[case]}
    torch.manual_seed(0)
    ref = RefVAE(
        RefDotConfig(
            {**spec, "loss_config": {"target": "torch.nn.Identity", "params": {}}}
        )
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from xdiffusion_tpu.autoencoders.hunyuan import (
        HunyuanCausal3DVAE,
        _HunyuanVAEModule,
    )
    from xdiffusion_tpu.config import DotConfig
    from xdiffusion_tpu.importers.autoencoders import import_hunyuan_vae_params

    ours = HunyuanCausal3DVAE(DotConfig(dict(spec)))
    params = ours.init_params(jax.random.PRNGKey(0), batch_size=1)
    ae = import_hunyuan_vae_params(params["ae"], sd)

    rng = np.random.default_rng(5)
    x01 = rng.random((2, 1, 9, 32, 32), dtype=np.float32)

    with torch.no_grad():
        ref_moments = ref.encode(torch.from_numpy(x01)).parameters.numpy()
    x_ours = jnp.asarray(
        (2.0 * x01 - 1.0).transpose(0, 2, 3, 4, 1), jnp.float32
    )
    our_moments = np.asarray(
        ours.module.apply(ae, x_ours, method=_HunyuanVAEModule.encode_moments)
    ).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(our_moments, ref_moments, atol=5e-4, rtol=5e-3)

    z = rng.standard_normal((2, 3, 8, 8, 4)).astype(np.float32)  # NDHWC
    with torch.no_grad():
        ref_dec = ref.decode(
            torch.from_numpy(z.transpose(0, 4, 1, 2, 3))
        ).numpy()
    our_dec = np.asarray(
        ours.decode_from_latents({"ae": ae}, jnp.asarray(z))
    ).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(
        np.clip(our_dec, -1.0, 1.0), 2.0 * ref_dec - 1.0, atol=5e-4, rtol=5e-3
    )
