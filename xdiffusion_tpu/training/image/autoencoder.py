"""VAE-GAN training loop (two alternating optimizers in one jitted step).

Behavioral counterpart of /root/reference/xdiffusion/training/video/
autoencoder.py:30-477: each step trains the autoencoder phase then the
discriminator phase. Instead of host-alternated optimizers, both updates
compose into ONE jitted program — grads for the AE phase use the frozen
discriminator, the discriminator phase sees stop-gradient reconstructions.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from xdiffusion_tpu import checkpoints
from xdiffusion_tpu.config import load_yaml, instantiate_from_config
from xdiffusion_tpu.datasets import load_dataset
from xdiffusion_tpu.datasets.utils import batch_iterator
from xdiffusion_tpu.parallel import make_mesh, shard_batch
from xdiffusion_tpu.training.common import MetricsLogger, save_image_grid


class VAETrainState(struct.PyTreeNode):
    step: jax.Array
    params: Dict  # {"ae": ..., "disc": ...}
    opt_ae: Any = struct.field(pytree_node=True, default=None)
    opt_disc: Any = struct.field(pytree_node=True, default=None)


def make_vae_train_step(vae, tx_ae, tx_disc):
    def step_fn(state: VAETrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_ae, rng_d = jax.random.split(rng)
        images = batch["images"]

        # Phase 0: autoencoder (discriminator frozen).
        def ae_loss(ae_params):
            loss, logs = vae.training_losses(
                {"ae": ae_params, "disc": state.params["disc"]},
                rng_ae,
                images,
                optimizer_idx=0,
                global_step=state.step,
            )
            return loss, logs

        (loss_ae, logs_ae), grads_ae = jax.value_and_grad(ae_loss, has_aux=True)(
            state.params["ae"]
        )
        updates, new_opt_ae = tx_ae.update(
            grads_ae, state.opt_ae, state.params["ae"]
        )
        new_ae = optax.apply_updates(state.params["ae"], updates)

        # Phase 1: discriminator (reconstructions stop-gradient inside loss).
        def d_loss(disc_params):
            loss, logs = vae.training_losses(
                {"ae": new_ae, "disc": disc_params},
                rng_d,
                images,
                optimizer_idx=1,
                global_step=state.step,
            )
            return loss, logs

        (loss_d, logs_d), grads_d = jax.value_and_grad(d_loss, has_aux=True)(
            state.params["disc"]
        )
        updates_d, new_opt_disc = tx_disc.update(
            grads_d, state.opt_disc, state.params["disc"]
        )
        new_disc = optax.apply_updates(state.params["disc"], updates_d)

        new_state = VAETrainState(
            step=state.step + 1,
            params={"ae": new_ae, "disc": new_disc},
            opt_ae=new_opt_ae,
            opt_disc=new_opt_disc,
        )
        metrics = {"loss_ae": loss_ae, "loss_disc": loss_d}
        metrics.update({k: v for k, v in logs_ae.items()})
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def train_autoencoder(
    config_path: str,
    num_training_steps: int = 10000,
    batch_size: int = 64,
    dataset_name: str = "image/mnist",
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

    vae = instantiate_from_config(
        config.autoencoder.to_dict(), use_config_struct=True
    )
    mesh = make_mesh()
    dataset, _ = load_dataset(dataset_name, config=config, split="train")
    batches = batch_iterator(dataset, batch_size, seed=seed)

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = vae.init_params(init_rng)
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(params["ae"]))
    print(f"autoencoder parameters: {n/1e6:.2f}M", flush=True)

    # Reference optimizer settings: Adam(lr, betas=(0.5, 0.9)) for both
    # (kl.py:131-145).
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

    step_fn = make_vae_train_step(vae, tx_ae, tx_disc)
    logger = MetricsLogger(out_dir)
    step_rng = jax.random.PRNGKey(seed + 1)
    t0 = time.time()

    for step in range(start_step, num_training_steps):
        batch = next(batches)
        device_batch = shard_batch({"images": batch["images"]}, mesh)
        state, metrics = step_fn(state, device_batch, step_rng)
        if step % 50 == 0 or step == num_training_steps - 1:
            logger.log(
                step,
                {k: metrics[k] for k in ("loss_ae", "loss_disc", "kl_loss")},
            )
        if (step + 1) % save_and_sample_every_n == 0 or (
            step + 1
        ) == num_training_steps:
            reconstruct_and_save(vae, state, batch["images"][:16], out_dir, step + 1)
            checkpoints.save_checkpoint(ckpt_dir, state, step + 1)
            print(f"checkpoint + reconstructions saved @ step {step+1}", flush=True)

    print(f"trained in {time.time()-t0:.1f}s", flush=True)
    logger.close()
    return out_dir


def reconstruct_and_save(vae, state, images, out_dir, step):
    z = vae.encode_to_latents(
        state.params, jnp.asarray(images), jax.random.PRNGKey(step)
    )
    recon = np.asarray(vae.decode_from_latents(state.params, z))
    pair = np.concatenate([images, np.clip(recon, 0, 1)], axis=2)
    save_image_grid(pair, os.path.join(out_dir, f"reconstruction-{step}.png"))
