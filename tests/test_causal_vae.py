"""Causal 3D video VAE tests: causality, compression arithmetic, both
config surfaces."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import DotConfig, instantiate_from_config


def tiny_ltx_cfg():
    return {
        "target": "xdiffusion.autoencoders.ltx_vae.CausalVideoAutoencoder",
        "params": {
            "dims": 3,
            "in_channels": 1,
            "out_channels": 1,
            "input_number_of_frames": 9,
            "latent_channels": 8,
            "encoder_blocks": [
                ["res_x", 1],
                ["compress_all", 1],
                ["res_x", 1],
                ["compress_all", 1],
            ],
            "decoder_blocks": [
                ["res_x", 1],
                ["compress_all", 1],
                ["res_x", 1],
                ["compress_all", 1],
            ],
            "scaling_factor": 1.0,
            "norm_layer": "pixel_norm",
            "latent_log_var": "uniform",
            # Reference invariant: uniform logvar requires no quant conv
            # (ltx_vae.py:98-99).
            "use_quant_conv": False,
        },
    }


def tiny_hunyuan_cfg():
    return {
        "target": "xdiffusion.autoencoders.hunyuan.HunyuanCausal3DVAE",
        "params": {
            "in_channels": 1,
            "out_channels": 1,
            "block_out_channels": [16, 32, 32],
            "latent_channels": 4,
            "layers_per_block": 1,
            "sample_size": 16,
            "sample_tsize": 9,
            "time_compression_ratio": 2,
            "spatial_compression_ratio": 4,
            "latent_logvar": "per_channel",
        },
    }


def test_ltx_vae_shapes_and_compression():
    vae = instantiate_from_config(tiny_ltx_cfg(), use_config_struct=True)
    params = vae.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 9, 16, 16, 1))
    z = vae.encode_to_latents(params, x, jax.random.PRNGKey(2))
    # Two compress_all stages: T 9 -> ceil(9/2)=5 -> 3; spatial 16 -> 4.
    assert z.shape == (1, 3, 4, 4, 8)
    recon = vae.decode_from_latents(params, z)
    # Decoder upsamples 2x per stage: T 3 -> 12 (>= input frames), 4 -> 16.
    assert recon.shape[2:] == (16, 16, 1)
    assert np.all(np.isfinite(np.asarray(recon)))


def test_hunyuan_vae_shapes():
    vae = instantiate_from_config(tiny_hunyuan_cfg(), use_config_struct=True)
    params = vae.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 9, 16, 16, 1))
    z = vae.encode_to_latents(params, x, jax.random.PRNGKey(2))
    # spatial ratio 4 (2 downs), temporal ratio 2 (1 down at the last
    # spatial transition): T 9 -> 5, S 16 -> 4.
    assert z.shape == (1, 5, 4, 4, 4)
    assert np.all(np.isfinite(np.asarray(z)))


def test_causal_conv_is_temporally_causal():
    from xdiffusion_tpu.autoencoders.causal_video import CausalConv3d

    conv = CausalConv3d(features=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 4, 4, 2))
    params = conv.init(jax.random.PRNGKey(1), x)
    y1 = conv.apply(params, x)
    # Changing FUTURE frames must not affect past outputs.
    x2 = x.at[:, 5:].set(0.0)
    y2 = conv.apply(params, x2)
    np.testing.assert_allclose(
        np.asarray(y1[:, :5]), np.asarray(y2[:, :5]), atol=1e-6
    )
    # And changing the first frame must not leak backwards (trivially true)
    # but must affect itself.
    x3 = x.at[:, 0].set(0.0)
    y3 = conv.apply(params, x3)
    assert not np.allclose(np.asarray(y1[:, 0]), np.asarray(y3[:, 0]))


def test_causal_vae_gan_training_losses():
    """VAE-GAN two-phase loss over a causal video VAE (3D PatchGAN)."""
    cfg = tiny_hunyuan_cfg()
    cfg["params"]["loss_config"] = {
        "target": "xdiffusion.autoencoders.losses.LPIPSWithDiscriminator",
        "params": {
            "rec_loss": "l2",
            "kl_weight": 1e-6,
            "disc_start": 0,
            "disc_weight": 0.05,
            "disc_in_channels": 1,
            "disc_num_layers": 2,
            "use_3d": True,
        },
    }
    vae = instantiate_from_config(cfg, use_config_struct=True)
    params = vae.init_params(jax.random.PRNGKey(0))
    assert "disc" in params
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 9, 16, 16, 1))

    for idx in (0, 1):
        loss, logs = jax.jit(
            lambda p, r, xx, step, i=idx: vae.training_losses(
                p, r, xx, optimizer_idx=i, global_step=step
            )
        )(params, jax.random.PRNGKey(2), x, jnp.zeros((), jnp.int32))
        assert np.isfinite(float(loss)), logs
    # AE-phase gradients flow into the encoder/decoder.
    def ae_loss(ae):
        loss, _ = vae.training_losses(
            {"ae": ae, "disc": params["disc"]},
            jax.random.PRNGKey(3), x, optimizer_idx=0,
            global_step=jnp.zeros((), jnp.int32),
        )
        return loss

    grads = jax.grad(ae_loss)(params["ae"])
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_ltx_reference_autoencoder_config_end_to_end():
    """Drive the REAL reference LTX autoencoder.yaml: faithful block
    grammar (res_x/res_x_y/compress_all), patchify 4, pixel_norm, uniform
    logvar without quant convs, denoising-decoder timestep conditioning,
    and the full loss (reconstruction-GAN + wavelet + perceptual,
    learned_logvar=False). Latent contract: (B,1,25,64,64) torch ->
    ours (B,25,64,64,1) -> z (B,4,2,2,128)."""
    from xdiffusion_tpu.config import load_yaml

    cfg = load_yaml(
        "/root/reference/configs/video/moving_mnist/ltx_video/autoencoder.yaml"
    )
    vae = instantiate_from_config(cfg.vae_config, use_config_struct=True)
    params = vae.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 25, 64, 64, 1))
    z = vae.encode_to_latents(params, x, jax.random.PRNGKey(2))
    assert z.shape == (1, 4, 2, 2, 128)
    recon = vae.decode_from_latents(params, z)
    assert recon.shape[2:] == (64, 64, 1) and recon.shape[1] >= 25
    # Timestep-conditioned decode (denoising decoder).
    recon_t = vae.decode_from_latents(
        params, z, timestep=jnp.full((1,), 0.1)
    )
    assert recon_t.shape == recon.shape
    assert not np.allclose(np.asarray(recon_t), np.asarray(recon))
    # Both GAN phases through the config's full loss stack.
    for idx in (0, 1):
        loss, logs = vae.training_losses(
            params, jax.random.PRNGKey(3), x, optimizer_idx=idx,
            global_step=jnp.zeros((), jnp.int32),
        )
        assert np.isfinite(float(loss)), logs
    # The param tree is the faithful architecture: DepthToSpaceUpsample
    # decoder stages and per-block scale-shift tables exist.
    import flax

    keys = {
        "/".join(map(str, k))
        for k in flax.traverse_util.flatten_dict(params["ae"]).keys()
    }
    assert any("scale_shift_table" in k for k in keys)
    assert any("up_2_compress_all" in k for k in keys)
    assert any("timestep_scale_multiplier" in k for k in keys)


def test_hunyuan_tiled_encode_decode():
    """Spatial/temporal tiled encode/decode (reference hunyuan.py:197-421):
    tiling must produce the same shapes as the direct path and agree in
    tile interiors (overlap bands are lerp-blended)."""
    cfg = tiny_hunyuan_cfg()
    vae = instantiate_from_config(cfg, use_config_struct=True)
    params = vae.init_params(jax.random.PRNGKey(0))
    # Input larger than the tile size in space.
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 9, 32, 32, 1))
    z_direct = vae.encode_to_latents(params, x, jax.random.PRNGKey(2))
    vae.enable_tiling(spatial=True, temporal=False)
    z_tiled = vae.encode_to_latents(params, x, jax.random.PRNGKey(2))
    assert z_tiled.shape == z_direct.shape
    recon_tiled = vae.decode_from_latents(params, z_tiled)
    vae.use_spatial_tiling = False
    recon_direct = vae.decode_from_latents(params, z_tiled)
    assert recon_tiled.shape == recon_direct.shape
    assert np.all(np.isfinite(np.asarray(recon_tiled)))


def test_opensora_hunyuan_variant_scale_shift():
    from xdiffusion_tpu.config import DotConfig
    from xdiffusion_tpu.autoencoders.opensora.hunyuan.autoencoder_kl_causal_3d import (
        AutoencoderKLCausal3D,
    )

    params_cfg = dict(tiny_hunyuan_cfg()["params"])
    params_cfg.pop("latent_logvar")
    params_cfg.update({"scale_factor": 0.5, "shift_factor": 0.1})
    vae = AutoencoderKLCausal3D(DotConfig(params_cfg))
    params = vae.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 9, 16, 16, 1))
    z = vae.encode_to_latents(params, x, jax.random.PRNGKey(2))
    # z = scale * (raw - shift); invert and compare against the base class.
    import xdiffusion_tpu.autoencoders.hunyuan as hy

    raw = hy.HunyuanCausal3DVAE.encode_to_latents(
        vae, params, x, jax.random.PRNGKey(2)
    )
    np.testing.assert_allclose(
        np.asarray(z), 0.5 * (np.asarray(raw) - 0.1), atol=1e-6
    )
    recon = vae.decode_from_latents(params, z)
    assert recon.shape[2:] == (16, 16, 1)
