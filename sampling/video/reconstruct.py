"""CLI: VAE reconstruction check for videos/images (reference command
surface: sampling/video/moving_mnist/reconstruct.py:30)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description="VAE reconstruction check.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--autoencoder_checkpoint", type=str, required=True)
    p.add_argument("--dataset_name", type=str, default="image/mnist")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--output_path", type=str, default="output/reconstructions")
    args = p.parse_args()

    import optax

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import instantiate_from_config, load_yaml
    from xdiffusion_tpu.datasets import load_dataset
    from xdiffusion_tpu.training.common import save_image_grid
    from xdiffusion_tpu.training.image.autoencoder import VAETrainState

    config = load_yaml(args.config_path)
    vae = instantiate_from_config(
        config.autoencoder.to_dict(), use_config_struct=True
    )
    params = vae.init_params(jax.random.PRNGKey(0))
    state = VAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_ae=optax.adam(1e-4).init(params["ae"]),
        opt_disc=optax.adam(1e-4).init(params["disc"]),
    )
    state, step = checkpoints.restore_checkpoint(
        args.autoencoder_checkpoint, state
    )
    print(f"restored VAE @ step {step}", flush=True)

    dataset, _ = load_dataset(args.dataset_name, config=config, split="val")
    images = (
        dataset.images[: args.num_samples].astype(np.float32) / 255.0
    )
    z = vae.encode_to_latents(
        state.params, jnp.asarray(images), jax.random.PRNGKey(1)
    )
    recon = np.asarray(vae.decode_from_latents(state.params, z))
    mse = float(np.mean((images - np.clip(recon, 0, 1)) ** 2))
    print(f"reconstruction MSE: {mse:.6f}", flush=True)

    os.makedirs(args.output_path, exist_ok=True)
    pair = np.concatenate([images, np.clip(recon, 0, 1)], axis=2)
    out = os.path.join(args.output_path, f"reconstruction-step{step}.png")
    save_image_grid(pair, out)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
