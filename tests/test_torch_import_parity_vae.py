"""Autoencoder golden parity against the reference torch stack.

With identical imported weights the LDM image VAE's encode moments and
decode reconstruction must match the reference `AutoencoderKL`
(reference autoencoders/kl.py:9-148 over layers.py:8-371 and the
single-head AttnBlock, attention.py:35-78). Exercises the full
encoder/decoder grammar: resblocks with nin shortcuts, asymmetric-pad
downsampling, nearest upsampling, mid + per-resolution attention, the
eps=1e-6 GroupNorms, and the quant/post-quant 1x1 convs.
"""

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import import_reference


def _ae_config_dict():
    # Shrunk from the reference's only AutoencoderKL config
    # (configs/audio/urbansound8k/autoencoder/urbansound8k_4x16x32.yaml):
    # ch=32 keeps the 32-group GroupNorm structure, three levels with a
    # channel bump, and attention at two resolutions (8 hits a down/up
    # level, and the mid block always attends).
    return {
        "double_z": True,
        "z_channels": 4,
        "resolution": 32,
        "in_channels": 1,
        "out_ch": 1,
        "ch": 32,
        "ch_mult": [1, 2, 2],
        "num_res_blocks": 2,
        "attn_resolutions": [8],
        "dropout": 0.0,
    }


def test_autoencoder_kl_matches_reference():
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.autoencoders.kl import AutoencoderKL as RefVAE
    from xdiffusion.utils import DotConfig as RefDotConfig

    torch.manual_seed(0)
    ref = RefVAE(
        RefDotConfig(
            {
                "embed_dim": 4,
                "encoder_decoder_config": _ae_config_dict(),
                # encode/decode never touch the loss; skip building the
                # discriminator (its lpips dep is stubbed in this env).
                "loss_config": {"target": "torch.nn.Identity", "params": {}},
            }
        )
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    import jax

    from xdiffusion_tpu.autoencoders.kl import AutoencoderKL
    from xdiffusion_tpu.autoencoders.kl import _AutoencoderKLModule
    from xdiffusion_tpu.config import DotConfig
    from xdiffusion_tpu.importers.autoencoders import (
        import_autoencoder_kl_params,
    )

    ours = AutoencoderKL(
        DotConfig(
            {"embed_dim": 4, "encoder_decoder_config": _ae_config_dict()}
        )
    )
    params = ours.init_params(jax.random.PRNGKey(0), batch_size=1)
    ae = import_autoencoder_kl_params(params["ae"], sd)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 1, 32, 32), dtype=np.float32)

    # Encoder + quant conv: the posterior's raw moments.
    with torch.no_grad():
        ref_moments = ref.encode(torch.from_numpy(x)).parameters.numpy()
    our_moments = np.asarray(
        ours.module.apply(
            ae,
            np.transpose(x, (0, 2, 3, 1)),
            method=_AutoencoderKLModule.encode_moments,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(our_moments, ref_moments, atol=2e-4, rtol=2e-3)

    # Post-quant conv + decoder.
    z = rng.standard_normal((2, 4, 8, 8), dtype=np.float32)
    with torch.no_grad():
        ref_dec = ref.decode(torch.from_numpy(z)).numpy()
    our_dec = np.asarray(
        ours.decode_from_latents({"ae": ae}, np.transpose(z, (0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(our_dec, ref_dec, atol=2e-4, rtol=2e-3)
