"""LTX-Video causal VAE golden parity against the reference torch stack.

With identical imported weights, encode moments and decode output must
match the reference `CausalVideoAutoencoder` (reference autoencoders/
ltx_vae.py:81-1425). Three configs cover the whole grammar:

- grammar: group_norm, quant convs, patchify(2), res_x / res_x_y /
  compress_all / compress_space, residual DepthToSpaceUpsample with
  channel reduction.
- denoise: pixel_norm, uniform log-var (no quant convs), patchify(4),
  compress_all_x_y, attn_res_x (qk RMS-norm attention), inject_noise
  blocks, non-causal decoder, denoising-decoder timestep conditioning
  (scale-shift tables + PixArt-style embedders).
- dual: dims=(2,1) — every conv a factorized DualConv3d.

Value convention: the reference normalizes [0,1] pixels to [-1,1] on
encode and back on decode internally; this framework keeps the VAE in
[-1,1] and lets the diffusion process own ranges, so the test feeds
ours `2x-1` and compares `2*ref-1` on decode.
"""

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.reference_helpers import import_reference

CONFIGS = {
    "grammar": {
        "dims": 3,
        "in_channels": 1,
        "out_channels": 1,
        "latent_channels": 4,
        "patch_size": 2,
        "norm_layer": "group_norm",
        "use_quant_conv": True,
        "causal_decoder": True,
        "timestep_conditioning": False,
        "input_number_of_frames": 5,
        "encoder_blocks": [
            ["res_x", 1],
            ["compress_all", 1],
            ["res_x_y", 1],
            ["res_x", 1],
        ],
        "decoder_blocks": [
            ["res_x", 1],
            ["compress_all", {"residual": True, "multiplier": 2}],
            ["res_x_y", 1],
            ["res_x", 1],
        ],
        "frames": 5,
        "size": 16,
        "latent_shape": (2, 3, 4, 4, 4),
        "timestep": None,
    },
    "denoise": {
        "dims": 3,
        "in_channels": 1,
        "out_channels": 1,
        "latent_channels": 4,
        "patch_size": 4,
        "norm_layer": "pixel_norm",
        "latent_log_var": "uniform",
        "use_quant_conv": False,
        "causal_decoder": False,
        "timestep_conditioning": True,
        "input_number_of_frames": 5,
        "encoder_blocks": [
            ["res_x", 1],
            ["compress_all_x_y", {"multiplier": 2}],
            ["res_x", 1],
        ],
        "decoder_blocks": [
            [
                "attn_res_x",
                {
                    "num_layers": 1,
                    "attention_head_dim": 64,
                    "inject_noise": True,
                },
            ],
            ["compress_all", {"residual": True, "multiplier": 1}],
            ["res_x_y", 1],
            ["res_x", {"num_layers": 1, "inject_noise": True}],
        ],
        "frames": 5,
        "size": 32,
        "latent_shape": (2, 3, 4, 4, 4),
        "timestep": np.array([0.05, 0.18], dtype=np.float32),
    },
    "dual": {
        "dims": [2, 1],
        "in_channels": 1,
        "out_channels": 1,
        "latent_channels": 4,
        "patch_size": 1,
        "norm_layer": "group_norm",
        "use_quant_conv": True,
        "causal_decoder": False,
        "timestep_conditioning": False,
        "input_number_of_frames": 5,
        # dims=(2,1) quirk: make_conv_nd's padding defaults to 0 and
        # DualConv3d honors it, so the compress conv runs UNPADDED —
        # 5x16x16 in -> 2x7x7 latents. A decoder DepthToSpaceUpsample
        # would need >=3 frames for its unpadded temporal k=3, so the
        # decoder here is a pure res stack.
        "encoder_blocks": [["res_x", 1], ["compress_all", 1]],
        "decoder_blocks": [["res_x", 1], ["res_x_y", 1]],
        "frames": 5,
        "size": 16,
        "latent_shape": (2, 2, 7, 7, 4),
        "timestep": None,
    },
}


@pytest.mark.parametrize("case", sorted(CONFIGS))
def test_ltx_vae_matches_reference(case, monkeypatch):
    import torch

    try:
        import_reference()
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    from xdiffusion.autoencoders import ltx_vae as ref_mod
    from xdiffusion.autoencoders.ltx_vae import (
        CausalVideoAutoencoder as RefVAE,
    )
    from xdiffusion.utils import DotConfig as RefDotConfig

    # Reference bug: with dims=(2,1) every ResnetBlock3D/decoder conv call
    # passes `causal=...`, but DualConv3d.forward has no such kwarg and
    # crashes (ltx_vae.py:891,1174,619). DualConv3d has no causal behavior
    # anyway — accept and ignore it so the torch side can run.
    _orig_dual_fwd = ref_mod.DualConv3d.forward

    def _dual_fwd(self, x, use_conv3d=False, skip_time_conv=False, causal=None):
        return _orig_dual_fwd(
            self, x, use_conv3d=use_conv3d, skip_time_conv=skip_time_conv
        )

    monkeypatch.setattr(ref_mod.DualConv3d, "forward", _dual_fwd)

    spec = dict(CONFIGS[case])
    frames, size = spec.pop("frames"), spec.pop("size")
    latent_shape, timestep = spec.pop("latent_shape"), spec.pop("timestep")

    torch.manual_seed(0)
    ref = RefVAE(
        RefDotConfig(
            {**spec, "loss_config": {"target": "torch.nn.Identity", "params": {}}}
        )
    )
    ref.eval()
    # Reference quirk: UNetMidBlock3D.forward reads
    # `attention.use_tpu_flash_attention` (ltx_vae.py:1322) but this
    # repo's diffusers-style Attention never defines it — the torch
    # attn_res_x path crashes as shipped. Pin it off.
    for m in ref.modules():
        if m.__class__.__name__ == "Attention":
            m.use_tpu_flash_attention = False
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from xdiffusion_tpu.autoencoders.ltx_vae import (
        CausalVideoAutoencoder,
        _LTXVAEModule,
    )
    from xdiffusion_tpu.config import DotConfig
    from xdiffusion_tpu.importers.autoencoders import import_ltx_vae_params

    ours = CausalVideoAutoencoder(DotConfig({**spec, "sample_size": size}))
    params = ours.init_params(jax.random.PRNGKey(0), batch_size=1)
    ae = import_ltx_vae_params(params["ae"], sd)

    rng = np.random.default_rng(3)
    x01 = rng.random((2, 1, frames, size, size), dtype=np.float32)

    with torch.no_grad():
        ref_moments = ref.encode(torch.from_numpy(x01)).parameters.numpy()
    # (B,C,F,H,W) [0,1] -> (B,F,H,W,C) [-1,1] (see module docstring).
    x_ours = jnp.asarray(
        (2.0 * x01 - 1.0).transpose(0, 2, 3, 4, 1), jnp.float32
    )
    our_moments = np.asarray(
        ours.module.apply(ae, x_ours, method=_LTXVAEModule.encode_moments)
    ).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(
        our_moments, ref_moments, atol=5e-4, rtol=5e-3
    )

    z = rng.standard_normal(latent_shape).astype(np.float32)  # NDHWC
    z_t = torch.from_numpy(z.transpose(0, 4, 1, 2, 3))
    t_ref = (
        torch.from_numpy(timestep).reshape(-1, 1, 1, 1, 1)
        if timestep is not None
        else None
    )
    with torch.no_grad():
        ref_dec = ref.decode(z_t, timestep=t_ref).numpy()
    our_dec = np.asarray(
        ours.decode_from_latents(
            {"ae": ae},
            jnp.asarray(z),
            timestep=(
                jnp.asarray(timestep) if timestep is not None else None
            ),
        )
    ).transpose(0, 4, 1, 2, 3)
    # The reference clamps decoded pixels to [-1,1] before the [0,1]
    # shift (utils.py:62-64); apply the same clamp to ours.
    np.testing.assert_allclose(
        np.clip(our_dec, -1.0, 1.0), 2.0 * ref_dec - 1.0, atol=5e-4, rtol=5e-3
    )
