"""Video-diffusion training loop.

Behavioral counterpart of /root/reference/xdiffusion/training/video/
train.py:38-451: per-stage training with frame-mask generators (FDM /
OpenSora), optional joint image/video steps (every Nth step trains on
single random frames), text prompts from labels. The jitted step is shared
with the image loop; image and video batches are two jit specializations
(static shapes per mode).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu import checkpoints, masking
from xdiffusion_tpu.config import load_yaml
from xdiffusion_tpu.datasets import load_dataset
from xdiffusion_tpu.optim import default_optimizer
from xdiffusion_tpu.parallel import (
    create_train_state,
    make_mesh,
    make_train_step,
    shard_batch,
)
from xdiffusion_tpu.training.common import MetricsLogger, save_image_grid
from xdiffusion_tpu.training.image.train import build_model, build_optimizer
from xdiffusion_tpu.training_utils import (
    get_training_batch,
    preprocess_training_videos,
)


def video_batch_iterator(dataset, batch_size: int, seed: int = 0):
    from xdiffusion_tpu.native import gather_normalize

    n = len(dataset)
    rng = np.random.default_rng(seed)
    videos = np.ascontiguousarray(dataset.videos)
    while True:
        order = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            yield (
                gather_normalize(videos, idx),
                dataset.labels[idx],
            )


def make_mask_generator(config):
    if "training" in config and "mask_ratios" in config.training:
        return masking.OpenSoraMaskGenerator(
            mask_ratios=config.training.mask_ratios.to_dict()
        )
    return masking.IdentityMaskGenerator()


def train(
    config_path: str,
    num_training_steps: int = 10000,
    batch_size: int = 8,
    dataset_name: str = "video/moving_mnist",
    output_path: str = "output",
    save_and_sample_every_n: int = 1000,
    joint_image_video_training_step: int = -1,
    resume_from: Optional[str] = None,
    load_model_weights_from_checkpoint: Optional[str] = None,
    load_vae_weights_from_checkpoint: Optional[str] = None,
    train_temporal_modules_only: bool = False,
    seed: int = 0,
    num_samples: int = 4,
    sampling_steps: int = 0,
) -> str:
    config = load_yaml(config_path)
    run_name = os.path.splitext(os.path.basename(config_path))[0]
    out_dir = os.path.join(output_path, dataset_name.replace("/", "_"), run_name)
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoints")

    model = build_model(config)
    # Startup model summary with a fully-populated fake context
    # (reference training/video/train.py:182 → ddpm.py:694-793).
    from xdiffusion_tpu.summary import print_model_summary

    print_model_summary(model)
    # Multi-host: initialize jax.distributed when launched as a pod
    # (no-op single-process); each host then loads only its batch shard
    # and shard_batch assembles the global array (SURVEY §2.14).
    from xdiffusion_tpu.parallel import (
        local_batch_size,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    mesh = make_mesh()
    if mesh.shape.get("sequence", 1) > 1:
        # Sequence parallelism (XDIFFUSION_MESH="data=N,sequence=M"):
        # register the mesh so self-attention routes through the
        # ring-attention shard_map (ops/attention.py).
        from xdiffusion_tpu.ops.attention import (
            set_sequence_parallel_mesh,
        )

        set_sequence_parallel_mesh(mesh)
    host_batch_size = local_batch_size(batch_size)
    dataset, convert_labels_to_prompts = load_dataset(
        dataset_name, config=config, split="train"
    )
    if getattr(dataset, "synthetic", False):
        print(
            "=" * 70
            + f"\nWARNING: {dataset_name} archives not found — training on "
            "the SYNTHETIC stand-in dataset. Quality metrics from this run "
            "are not comparable to real-data numbers.\nFetch real data "
            "with: python tools/fetch_datasets.py --dataset all\n"
            + "=" * 70,
            flush=True,
        )
    # Per-host loading (multi-host: each process draws its shard).
    from xdiffusion_tpu.datasets.utils import prefetch

    batches = prefetch(video_batch_iterator(
        dataset, host_batch_size, seed=seed + jax.process_index()
    ))
    mask_generator = make_mask_generator(model.models()[0].config())

    # Latent video diffusion: load the frozen causal VAE and fix the
    # latent scale from a representative batch (mirrors the image trainer;
    # reference --load_vae_weights_from_checkpoint).
    stage0 = model.models()[0]
    if getattr(stage0, "latent_encoder", lambda: None)() is not None:
        vae = stage0.latent_encoder()
        vae_params = vae.init_params(jax.random.PRNGKey(seed + 7))
        if load_vae_weights_from_checkpoint:
            import optax

            from xdiffusion_tpu.training.image.autoencoder import (
                VAETrainState,
            )

            skeleton = VAETrainState(
                step=jnp.zeros((), jnp.int32),
                params=vae_params,
                opt_ae=optax.adam(1e-4).init(vae_params["ae"]),
                opt_disc=(
                    optax.adam(1e-4).init(vae_params["disc"])
                    if "disc" in vae_params
                    else None
                ),
            )
            loaded, _ = checkpoints.restore_checkpoint(
                load_vae_weights_from_checkpoint, skeleton
            )
            vae_params = loaded.params
            print(
                f"loaded frozen VAE from {load_vae_weights_from_checkpoint}",
                flush=True,
            )
        stage0.set_latent_encoder_params(vae_params)
        first_videos, _ = next(batches)
        scale = stage0.compute_latent_scale(
            jnp.asarray(first_videos), jax.random.PRNGKey(seed + 8)
        )
        print(f"latent scale factor: {scale:.4f}", flush=True)

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init_params(init_rng)
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    print(f"score network parameters: {n_params/1e6:.2f}M", flush=True)

    tx = build_optimizer(config)
    missing: list = []
    if load_model_weights_from_checkpoint and not resume_from:
        # Image->video transfer: the checkpoint may be a 2D image UNet; the
        # matching backbone restores, the identity/zero-init temporal
        # modules keep their fresh values (reference ddpm.py:810-814).
        params, ckpt_step, missing = checkpoints.restore_params_partial(
            load_model_weights_from_checkpoint, params
        )
        print(
            f"warm-started from step {ckpt_step}; "
            f"{len(missing)} temporal/motion params kept at init",
            flush=True,
        )
    if train_temporal_modules_only:
        # Frozen image backbone: optimizer updates apply ONLY to the
        # temporal/motion params the transfer left at init (the reference
        # Video-LDM / AnimateDiff fine-tuning recipe: 2D weights frozen,
        # temporal adapters trained).
        assert load_model_weights_from_checkpoint, (
            "train_temporal_modules_only needs "
            "load_model_weights_from_checkpoint"
        )
        from flax.traverse_util import flatten_dict, unflatten_dict

        missing_set = set(missing)

        def labels(tree):
            flat = flatten_dict(tree)
            return unflatten_dict(
                {
                    p: (
                        "train"
                        if "/".join(str(k) for k in p) in missing_set
                        else "freeze"
                    )
                    for p in flat
                }
            )

        import optax

        # NOT optax.masked: masked passes non-selected updates through
        # unchanged (raw gradients); frozen params need zero updates.
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
        n_train = len(missing)
        print(
            f"temporal-only fine-tuning: {n_train} trainable param tensors, "
            "backbone frozen",
            flush=True,
        )
    state = create_train_state(params, tx)
    # Mesh-driven placement (parallel/placement.py): fsdp/tensor/expert
    # axes shard params + optimizer state; plain data meshes replicate.
    from xdiffusion_tpu.parallel import shard_train_state

    state, sharding_tree = shard_train_state(state, mesh)
    start_step = 0
    if resume_from:
        state, start_step = checkpoints.restore_checkpoint(
            resume_from, state, shardings=sharding_tree
        )

    train_step = make_train_step(
        model, tx, mesh, state_shardings=sharding_tree
    )
    from xdiffusion_tpu.training.image.train import _is_text_conditional

    needs_text = _is_text_conditional(model.models()[0])
    logger = MetricsLogger(out_dir)
    host_rng = np.random.default_rng(seed + 2)
    step_rng = jax.random.PRNGKey(seed + 1)
    t0 = time.time()

    # Flexible-Diffusion-Modeling batch scheme (reference FDM config key
    # training.flexible_diffusion_modeling): random latent/observed frame
    # subsets with explicit source frame indices for the RPE attention.
    use_fdm = bool(
        "training" in config
        and config.training.get("flexible_diffusion_modeling", False)
    )
    fdm_method = (
        config.training.get("flexible_diffusion_modeling_method", "random")
        if use_fdm
        else None
    )

    for step in range(start_step, num_training_steps):
        videos, labels = next(batches)
        is_image_batch = (
            joint_image_video_training_step > 1
            and step % joint_image_video_training_step == 0
        ) or joint_image_video_training_step == 1
        videos = get_training_batch(videos, is_image_batch, rng=host_rng)
        stage_cfg = model.models()[0].config()
        videos, extra_ctx = preprocess_training_videos(
            videos,
            stage_cfg,
            mask_generator=None if is_image_batch else mask_generator,
            rng=host_rng,
        )
        if use_fdm and not is_image_batch:
            from xdiffusion_tpu.training_utils import sample_fdm_training_batch

            videos, fi, obs_m, lat_m = sample_fdm_training_batch(
                videos, videos.shape[1], method=fdm_method, rng=host_rng
            )
            extra_ctx["video_mask"] = lat_m.astype(bool)
            extra_ctx["observed_mask"] = obs_m.astype(np.float32)
            extra_ctx["frame_indices"] = fi

        device_batch: Dict = {"images": videos}
        if "video_mask" in extra_ctx and extra_ctx["video_mask"] is not None:
            device_batch["video_mask"] = extra_ctx["video_mask"]
        if "frame_indices" in extra_ctx:
            device_batch["frame_indices"] = extra_ctx["frame_indices"]
        if "observed_mask" in extra_ctx:
            device_batch["observed_mask"] = extra_ctx["observed_mask"]
        if needs_text:
            # Label -> prompt -> tokens/embeddings, all host-side; only
            # arrays cross into the jitted step.
            ctx = model.models()[0].preprocess_context(
                {"text_prompts": convert_labels_to_prompts(labels)}
            )
            for k, v in ctx.items():
                if hasattr(v, "shape"):
                    device_batch[k] = v
        device_batch = shard_batch(device_batch, mesh)
        state, metrics = train_step(state, device_batch, step_rng)

        if step % 50 == 0 or step == num_training_steps - 1:
            logger.log(
                step,
                {
                    "loss": metrics["loss"],
                    "mse_loss": metrics["mse_loss"],
                    "image_batch": float(is_image_batch),
                },
            )

        if (step + 1) % save_and_sample_every_n == 0 or (
            step + 1
        ) == num_training_steps:
            sample_and_save_video(
                model, state, out_dir, step + 1, num_samples,
                sampling_steps=sampling_steps,
            )
            checkpoints.save_checkpoint(ckpt_dir, state, step + 1)
            print(f"checkpoint + samples saved @ step {step+1}", flush=True)

    wall = time.time() - t0
    steps = num_training_steps - start_step
    print(f"trained {steps} steps in {wall:.1f}s", flush=True)
    logger.close()
    return out_dir


def sample_and_save_video(model, state, out_dir, step, num_samples=4,
                          sampling_steps=0):
    from xdiffusion_tpu.training.image.train import _is_text_conditional

    params = state.ema_params if state.ema_params is not None else state.params
    first = model.models()[0] if hasattr(model, "models") else model
    context = {}
    if _is_text_conditional(first):
        context["text_prompts"] = [str(i % 10) for i in range(num_samples)]
    kwargs = {"num_sampling_steps": sampling_steps} if sampling_steps else {}
    samples = model.sample(
        params, jax.random.PRNGKey(step), num_samples=num_samples,
        context=context, **kwargs,
    )
    videos = np.asarray(samples)  # (B, F, H, W, C)
    # Save a frame strip per video + an animated GIF.
    b, f = videos.shape[:2]
    strip = videos.transpose(0, 2, 1, 3, 4).reshape(
        b, videos.shape[2], f * videos.shape[3], videos.shape[4]
    )
    save_image_grid(strip, os.path.join(out_dir, f"sample-{step}.png"), cols=1)
    save_gif(videos, os.path.join(out_dir, f"sample-{step}.gif"))


def save_gif(videos: np.ndarray, path: str, fps: int = 4):
    """(B, F, H, W, C) [0,1] -> tiled animated GIF."""
    from PIL import Image

    b, f, h, w, c = videos.shape
    cols = int(np.ceil(np.sqrt(b)))
    rows = int(np.ceil(b / cols))
    frames = []
    for fi in range(f):
        grid = np.zeros((rows * h, cols * w), dtype=np.uint8)
        for i in range(b):
            r, col = divmod(i, cols)
            grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = (
                np.clip(videos[i, fi, :, :, 0], 0, 1) * 255
            ).astype(np.uint8)
        frames.append(Image.fromarray(grid, mode="L"))
    frames[0].save(
        path,
        save_all=True,
        append_images=frames[1:],
        duration=int(1000 / fps),
        loop=0,
    )
