"""Image-diffusion training loop.

Behavioral counterpart of the reference loop
(/root/reference/xdiffusion/training/image/train.py:35-456) rebuilt around
the jitted step: instead of an eager host loop with per-op dispatch and a
DDP wrapper, the host only feeds numpy batches onto the mesh and
checkpoints/samples at intervals — all math lives in two compiled
programs (train step, sample scan).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu import checkpoints
from xdiffusion_tpu.config import DotConfig, instantiate_from_config, load_yaml
from xdiffusion_tpu.datasets import load_dataset
from xdiffusion_tpu.datasets.utils import batch_iterator, prefetch
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
from xdiffusion_tpu.optim import Adam, default_optimizer
from xdiffusion_tpu.parallel import (
    create_train_state,
    make_mesh,
    make_train_step,
    shard_batch,
)
from xdiffusion_tpu.training.common import MetricsLogger, save_image_grid


def build_model(config: DotConfig):
    """Instantiate the diffusion process named by the config (top-level
    `target:`, `diffusion_cascade:`, or the default DDPM process).
    Reference branching: training/image/train.py:136-141."""
    from xdiffusion_tpu.config import get_obj_from_str

    if "diffusion_cascade" in config:
        from xdiffusion_tpu.diffusion.cascade import GaussianDiffusionCascade

        return GaussianDiffusionCascade(config)
    if "target" in config:
        return get_obj_from_str(config.to_dict()["target"])(config)
    return GaussianDiffusion_DDPM(config)


def build_optimizer(config: DotConfig):
    if "optimizer" in config:
        opt = instantiate_from_config(config.optimizer.to_dict())
    else:
        opt = default_optimizer()
    schedule = None
    if "learning_rate_schedule" in config:
        schedule = instantiate_from_config(
            config.learning_rate_schedule.to_dict()
        )
    return opt.build(schedule)


def train(
    config_path: str,
    num_training_steps: int = 10000,
    batch_size: int = 128,
    dataset_name: str = "image/mnist",
    output_path: str = "output",
    save_and_sample_every_n: int = 1000,
    sample_with_guidance: bool = False,
    resume_from: Optional[str] = None,
    load_model_weights_from_checkpoint: Optional[str] = None,
    vae_checkpoint: Optional[str] = None,
    seed: int = 0,
    mixed_precision: str = "",
    num_samples: int = 64,
    profile_start_step: int = -1,
    debug_nans: bool = False,
    use_lora_training: bool = False,
    lora_rank: int = 4,
    gradient_accumulation_steps: int = 1,
) -> str:
    """Train an image diffusion model from a YAML config.

    Returns the run output directory (checkpoints + sample grids +
    metrics.jsonl inside).
    """
    config = load_yaml(config_path)
    if "training" in config and "batch_size" in config.training:
        # Config batch size takes precedence unless CLI overrides
        # (reference precedence: train.py:71-80).
        if batch_size <= 0:
            batch_size = config.training.batch_size

    run_name = os.path.splitext(os.path.basename(config_path))[0]
    out_dir = os.path.join(output_path, dataset_name.replace("/", "_"), run_name)
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoints")

    model = build_model(config)

    # Startup model summary with a fully-populated fake context
    # (reference training/image/train.py:157 → ddpm.py:694-793).
    from xdiffusion_tpu.summary import print_model_summary

    print_model_summary(model)

    # Optional sampling-time prompt encoder (reference training/image/
    # train.py:237-248): a host-side context preprocessor applied to the
    # eval-sampling context (e.g. a frozen T5/CLIP embedder).
    prompt_encoder = None
    if "sampling" in config and "prompt_encoder" in config.sampling:
        prompt_encoder = instantiate_from_config(
            config.sampling.prompt_encoder.to_dict()
        )
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
    pipeline_active = mesh.shape.get("pipeline", 1) > 1
    if pipeline_active:
        # Pipeline parallelism (XDIFFUSION_MESH="data=N,pipeline=S"):
        # supporting score networks route their block stacks through the
        # GPipe engine while this context is installed (cleared around
        # eval sampling, whose batch need not divide the microbatches).
        from xdiffusion_tpu.parallel.pipeline import (
            set_pipeline_parallel_mesh,
        )

        set_pipeline_parallel_mesh(mesh)
    host_batch_size = local_batch_size(batch_size)
    print(
        f"mesh: {mesh.shape} | devices: {len(jax.devices())} "
        f"| batch/device: {batch_size // max(mesh.shape['data'],1)}",
        flush=True,
    )

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
    # Per-host loading: each process draws a distinct stream and only
    # its share of the global batch (reference: DDP DistributedSampler).
    batches = prefetch(batch_iterator(
        dataset, host_batch_size, seed=seed + jax.process_index()
    ))

    # Latent diffusion: load the frozen VAE and fix the latent scale from a
    # representative batch (explicit init of reference ddpm.py:171-176).
    if getattr(model, "latent_encoder", lambda: None)() is not None:
        vae = model.latent_encoder()
        vae_params = vae.init_params(jax.random.PRNGKey(seed + 7))
        if vae_checkpoint:
            import optax

            from xdiffusion_tpu.training.image.autoencoder import VAETrainState

            vae_state = VAETrainState(
                step=jnp.zeros((), jnp.int32),
                params=vae_params,
                opt_ae=optax.adam(1e-4).init(vae_params["ae"]),
                opt_disc=optax.adam(1e-4).init(vae_params["disc"]),
            )
            vae_state, _ = checkpoints.restore_checkpoint(
                vae_checkpoint, vae_state
            )
            vae_params = vae_state.params
            print(f"loaded frozen VAE from {vae_checkpoint}", flush=True)
        model.set_latent_encoder_params(vae_params)
        first = next(batches)
        scale = model.compute_latent_scale(
            jnp.asarray(first["images"]), jax.random.PRNGKey(seed + 8)
        )
        print(f"latent scale factor: {scale:.4f}", flush=True)

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init_params(init_rng)
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    print(f"score network parameters: {n_params/1e6:.2f}M", flush=True)

    tx = build_optimizer(config)
    if gradient_accumulation_steps > 1:
        import optax

        tx = optax.MultiSteps(tx, gradient_accumulation_steps)
    ema_cfg = config.get("training")
    use_ema = bool(ema_cfg and ema_cfg.get("ema_decay"))

    # LoRA fine-tuning: freeze the base parameters and optimize only the
    # low-rank factors (reference: --use_lora_training + lora.py
    # inject_trainable_lora). The effective params are rebuilt inside the
    # traced loss via param_transform.
    param_transform = None
    lora_meta = None
    if use_lora_training:
        from xdiffusion_tpu import lora as lora_lib

        base_params = params
        lora = lora_lib.inject_trainable_lora(
            base_params, jax.random.PRNGKey(seed + 11), r=lora_rank
        )
        lora_meta = {"rank": lora["rank"], "scale": lora["scale"]}

        def param_transform(weights):
            return lora_lib.apply_lora(
                base_params, {**lora_meta, "weights": weights}
            )

        params = lora["weights"]
        n_lora = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
        print(
            f"LoRA fine-tuning: rank {lora_rank}, {n_lora/1e6:.3f}M trainable "
            f"(base frozen)",
            flush=True,
        )
    importance = (
        model.importance_sampler() if hasattr(model, "importance_sampler") else None
    )
    device_importance = importance is not None and hasattr(
        importance, "init_device_state"
    )
    state = create_train_state(
        params,
        tx,
        ema=use_ema,
        importance_sampler=importance if device_importance else None,
    )

    # Mesh-driven state placement — the TPU-native accelerator.prepare()
    # (reference training/image/train.py:215-226): fsdp/tensor/expert axes
    # shard parameters + optimizer moments + EMA per parallel/placement.py;
    # a plain data mesh replicates. Restores read each array directly into
    # its shard layout.
    from xdiffusion_tpu.parallel import shard_train_state

    state, sharding_tree = shard_train_state(state, mesh)
    if any(
        mesh.shape.get(ax, 1) > 1 for ax in ("fsdp", "tensor", "expert")
    ):
        n_shard = sum(
            1
            for s in jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: x.sharding, state.params)
            )
            if not s.is_fully_replicated
        )
        print(f"sharded params: {n_shard} tensors", flush=True)

    start_step = 0
    if resume_from:
        state, start_step = checkpoints.restore_checkpoint(
            resume_from, state, shardings=sharding_tree
        )
        print(f"resumed from {resume_from} @ step {start_step}", flush=True)
    elif load_model_weights_from_checkpoint:
        loaded, _ = checkpoints.restore_checkpoint(
            load_model_weights_from_checkpoint, state, shardings=sharding_tree
        )
        state = state.replace(params=loaded.params)

    ema_decay = float(ema_cfg.get("ema_decay")) if use_ema else None
    train_step = make_train_step(
        model,
        tx,
        mesh,
        ema_decay=ema_decay,
        param_transform=param_transform,
        importance_sampler=importance if device_importance else None,
        state_shardings=sharding_tree,
    )

    host_importance = (
        importance is not None
        and not device_importance
        and not importance.device_side
    )

    sn_config = (
        config if "diffusion" in config else model.models()[0].config()
    )
    sn_params = sn_config.diffusion.score_network.params
    is_class_conditional = bool(
        sn_params.get("is_class_conditional", False)
    ) or int(sn_params.get("label_dim", 0) or 0) > 0
    preprocessors = getattr(model, "_context_preprocessors", [])
    uses_prompts = any(
        type(p).__name__ != "IgnoreContextAdapter" for p in preprocessors
    )

    logger = MetricsLogger(out_dir)
    from xdiffusion_tpu.profiling import StepProfiler, enable_nan_debugging

    if debug_nans:
        enable_nan_debugging(True)
    profiler = StepProfiler(out_dir, start_step=profile_start_step)
    step_rng = jax.random.PRNGKey(seed + 1)
    t_start = time.time()

    for step in range(start_step, num_training_steps):
        profiler.maybe_start(step)
        batch = next(batches)
        device_batch: Dict = {"images": batch["images"]}
        if is_class_conditional:
            device_batch["classes"] = batch["classes"]
        if uses_prompts:
            ctx = model.preprocess_context(
                {"text_prompts": convert_labels_to_prompts(batch["classes"])}
            )
            for k, v in ctx.items():
                if isinstance(v, (np.ndarray, jnp.ndarray)):
                    device_batch[k] = v
        if host_importance:
            t, w = importance.sample(batch_size)
            device_batch["timesteps"] = t
            device_batch["loss_weights"] = w

        device_batch = shard_batch(device_batch, mesh)
        state, metrics = train_step(state, device_batch, step_rng)

        profiler.maybe_stop(step)
        if host_importance:
            importance.update_with_all_losses(
                np.asarray(metrics["timesteps"]),
                np.asarray(metrics["loss_per_example"]),
            )

        if step % 50 == 0 or step == num_training_steps - 1:
            logger.log(
                step,
                {
                    "loss": metrics["loss"],
                    "mse_loss": metrics["mse_loss"],
                    "vb_loss": metrics["vb_loss"],
                    "grad_norm": metrics["grad_norm"],
                },
            )

        if (step + 1) % save_and_sample_every_n == 0 or (
            step + 1
        ) == num_training_steps:
            sample_state = state
            if param_transform is not None:
                # Sampling needs the EFFECTIVE params (base + LoRA deltas).
                sample_state = state.replace(
                    params=param_transform(state.params),
                    ema_params=(
                        param_transform(state.ema_params)
                        if state.ema_params is not None
                        else None
                    ),
                )
            if pipeline_active:
                # Eval sampling runs unpipelined (its batch need not
                # divide the microbatch count; params are replicated
                # over the pipeline axis so the math is identical).
                from xdiffusion_tpu.parallel.pipeline import (
                    set_pipeline_parallel_mesh,
                )

                set_pipeline_parallel_mesh(None)
            try:
                sample_and_save(
                    model,
                    sample_state,
                    out_dir,
                    step + 1,
                    num_samples=num_samples,
                    guidance=sample_with_guidance,
                    is_class_conditional=is_class_conditional,
                    prompt_encoder=prompt_encoder,
                    logger=logger,
                )
            finally:
                if pipeline_active:
                    set_pipeline_parallel_mesh(mesh)
            checkpoints.save_checkpoint(ckpt_dir, state, step + 1)
            if use_lora_training:
                from xdiffusion_tpu import lora as lora_lib

                lora_lib.save_lora_weights(
                    {**lora_meta, "weights": jax.device_get(state.params)},
                    os.path.join(out_dir, "lora_weights.pkl"),
                )
            print(f"checkpoint + samples saved @ step {step+1}", flush=True)

    profiler.close()
    wall = time.time() - t_start
    steps_done = num_training_steps - start_step
    print(
        f"trained {steps_done} steps in {wall:.1f}s "
        f"({steps_done/max(wall,1e-9):.2f} steps/s)",
        flush=True,
    )
    logger.close()
    if pipeline_active:
        # Clear the process-wide pipeline context installed above so
        # subsequent (non-pipelined) work in this process is unaffected.
        from xdiffusion_tpu.parallel.pipeline import (
            set_pipeline_parallel_mesh,
        )

        set_pipeline_parallel_mesh(None)
    return out_dir


def _is_text_conditional(model) -> bool:
    """True when the model's CFG or conditioning signals include a text
    signal — the trainer then samples with digit-name prompts."""
    try:
        diff = model.config().diffusion
    except Exception:
        return False
    signals = []
    if "classifier_free_guidance" in diff:
        signals += list(diff.classifier_free_guidance.get("signals", []))
    sn = diff.score_network.params if "score_network" in diff else {}
    if "conditioning" in sn:
        signals += list(sn.conditioning.signals)
    if "context_preprocessing" in diff:
        for prep in diff.context_preprocessing:
            target = (prep.get("target", "") or "").lower()
            if "text" in target or "clip" in target:
                return True
    return any("text" in s for s in signals)


def sample_and_save(
    model,
    state,
    out_dir: str,
    step: int,
    num_samples: int = 64,
    guidance: bool = False,
    is_class_conditional: bool = False,
    prompt_encoder=None,
    logger=None,
):
    params = state.ema_params if state.ema_params is not None else state.params
    context: Dict = {}
    cfg_value = None
    if is_class_conditional:
        classes = np.arange(num_samples, dtype=np.int32) % 10
        context["classes"] = jnp.asarray(classes)
        if guidance and hasattr(model, "classifier_free_guidance"):
            cfg_value = float(model.classifier_free_guidance())
    if _is_text_conditional(model):
        # Digit-name prompts; preprocess_context tokenizes/embeds them.
        context["text_prompts"] = [
            str(i % 10) for i in range(num_samples)
        ]
        if guidance and hasattr(model, "classifier_free_guidance"):
            cfg_value = float(model.classifier_free_guidance())
    if prompt_encoder is not None:
        context = prompt_encoder(context)
    samples = model.sample(
        params,
        jax.random.PRNGKey(step),
        num_samples=num_samples,
        context=context,
        classifier_free_guidance=cfg_value,
    )
    samples = np.asarray(samples)
    save_image_grid(samples, os.path.join(out_dir, f"sample-{step}.png"))
    if logger is not None:
        # Mirror the PNG grid into TensorBoard (reference add_image).
        logger.log_image_grid("samples", samples, step)
