"""Video (causal 3D) VAE-GAN training loop.

Behavioral counterpart of /root/reference/xdiffusion/training/video/
autoencoder.py:30-477: alternating autoencoder/discriminator phases over
(B, F, H, W, C) clips. Reuses the image VAE trainer's jitted two-phase
step (training/image/autoencoder.py — both phases compose into one
compiled program); only the data pipeline and the reconstruction
preview differ.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xdiffusion_tpu import checkpoints
from xdiffusion_tpu.config import instantiate_from_config, load_yaml
from xdiffusion_tpu.datasets import load_dataset
from xdiffusion_tpu.parallel import make_mesh, shard_batch
from xdiffusion_tpu.training.common import MetricsLogger, save_image_grid
from xdiffusion_tpu.training.image.autoencoder import (
    VAETrainState,
    make_vae_train_step,
)
from xdiffusion_tpu.training.video.train import video_batch_iterator


def train_autoencoder(
    config_path: str,
    num_training_steps: int = 10000,
    batch_size: int = 4,
    dataset_name: str = "video/moving_mnist",
    output_path: str = "output",
    save_and_sample_every_n: int = 1000,
    learning_rate: float = 4.5e-6,
    resume_from: Optional[str] = None,
    seed: int = 0,
) -> str:
    config = load_yaml(config_path)
    run_name = os.path.splitext(os.path.basename(config_path))[0]
    out_dir = os.path.join(
        output_path, dataset_name.replace("/", "_"), run_name
    )
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoints")

    vae_key = "autoencoder" if "autoencoder" in config else "vae_config"
    vae = instantiate_from_config(
        config[vae_key].to_dict(), use_config_struct=True
    )
    assert vae.loss_module is not None, (
        f"{config_path}: the autoencoder config needs a loss_config block "
        "to be trainable"
    )
    mesh = make_mesh()
    dataset, _ = load_dataset(dataset_name, config=config, split="train")
    batches = video_batch_iterator(dataset, batch_size, seed=seed)

    # Match the model's expected clip length.
    num_frames = int(
        config[vae_key].params.get(
            "input_number_of_frames",
            config[vae_key].params.get("sample_tsize", 17),
        )
    )

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = vae.init_params(init_rng)
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(params["ae"]))
    print(f"video autoencoder parameters: {n/1e6:.2f}M", flush=True)

    tx_ae = optax.adam(learning_rate, b1=0.5, b2=0.9)
    tx_disc = optax.adam(learning_rate, b1=0.5, b2=0.9)
    state = VAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_ae=tx_ae.init(params["ae"]),
        opt_disc=tx_disc.init(params["disc"]),
    )
    # Mesh-driven placement (fsdp shards VAE params + both optimizers'
    # moments; plain data meshes replicate) — parallel/placement.py.
    from xdiffusion_tpu.parallel import shard_train_state

    state, sharding_tree = shard_train_state(state, mesh)
    start_step = 0
    if resume_from:
        state, start_step = checkpoints.restore_checkpoint(
            resume_from, state, shardings=sharding_tree
        )

    train_step = make_vae_train_step(vae, tx_ae, tx_disc)
    logger = MetricsLogger(out_dir)
    step_rng = jax.random.PRNGKey(seed + 1)
    t0 = time.time()

    for step in range(start_step, num_training_steps):
        videos, _ = next(batches)
        videos = jnp.asarray(videos[:, :num_frames])
        batch = shard_batch({"images": videos}, mesh)
        state, metrics = train_step(state, batch, step_rng)

        if step % 50 == 0 or step == num_training_steps - 1:
            logger.log(
                step,
                {k: metrics[k] for k in ("total_loss", "kl_loss", "disc_loss")
                 if k in metrics},
            )

        if (step + 1) % save_and_sample_every_n == 0 or (
            step + 1
        ) == num_training_steps:
            _save_reconstructions(
                vae, state, videos[:2], out_dir, step + 1, seed
            )
            checkpoints.save_checkpoint(ckpt_dir, state, step + 1)
            print(f"checkpoint + reconstructions @ step {step+1}", flush=True)

    wall = time.time() - t0
    print(
        f"trained {num_training_steps - start_step} steps in {wall:.1f}s",
        flush=True,
    )
    logger.close()
    return out_dir


def _save_reconstructions(vae, state, clips, out_dir, step, seed):
    z = vae.encode_to_latents(
        state.params, clips, jax.random.PRNGKey(seed + 3)
    )
    recon = np.asarray(vae.decode_from_latents(state.params, z))
    recon = recon[:, : clips.shape[1]]
    b, f = recon.shape[:2]
    # input strip over recon strip, one row per clip
    strips = []
    for i in range(b):
        top = np.concatenate([np.asarray(clips[i, j]) for j in range(f)], axis=1)
        bottom = np.concatenate([recon[i, j] for j in range(f)], axis=1)
        strips.append(np.concatenate([top, np.clip(bottom, 0, 1)], axis=0))
    save_image_grid(
        np.stack(strips), os.path.join(out_dir, f"recon-{step}.png"), cols=1
    )
