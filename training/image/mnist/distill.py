"""CLI: progressive distillation (Salimans & Ho 2022).

Reference command surface (training/image/mnist/distill.py:492-499):
--teacher_model_checkpoint, --distillation_iterations,
--initial_sampling_steps. Each iteration halves the sampling-step count:
the student learns to match two teacher DDIM steps with one, then becomes
the next teacher.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description="Progressive distillation.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--teacher_model_checkpoint", type=str, required=True)
    p.add_argument("--distillation_iterations", type=int, default=4)
    p.add_argument("--initial_sampling_steps", type=int, default=1024)
    p.add_argument("--steps_per_iteration", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--dataset_name", type=str, default="image/mnist")
    p.add_argument("--output_path", type=str, default="output/distilled")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.datasets import load_dataset
    from xdiffusion_tpu.datasets.utils import batch_iterator
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import (
        create_train_state,
        make_mesh,
        shard_batch,
    )
    from xdiffusion_tpu.parallel.mesh import replicated
    from xdiffusion_tpu.training.common import MetricsLogger
    import optax

    config = load_yaml(args.config_path)
    model = GaussianDiffusion_DDPM(config)
    assert model.noise_scheduler().continuous(), (
        "progressive distillation requires a continuous (logSNR) scheduler"
    )
    mesh = make_mesh()
    dataset, _ = load_dataset(args.dataset_name, config=config, split="train")
    batches = batch_iterator(dataset, args.batch_size, seed=args.seed)

    # Teacher weights from the checkpoint; student starts as a copy.
    params = model.init_params(jax.random.PRNGKey(args.seed))
    tx = default_optimizer().build()
    state = create_train_state(params, tx)
    state, _ = checkpoints.restore_checkpoint(
        args.teacher_model_checkpoint, state
    )
    teacher_params = state.params
    os.makedirs(args.output_path, exist_ok=True)
    logger = MetricsLogger(args.output_path)

    n = args.initial_sampling_steps
    rng = jax.random.PRNGKey(args.seed + 1)
    for iteration in range(args.distillation_iterations):
        n = max(n // 2, 1)
        print(f"distillation iteration {iteration}: N={n}", flush=True)
        student = create_train_state(teacher_params, tx)
        student = jax.device_put(student, replicated(mesh))
        teacher = jax.device_put(teacher_params, replicated(mesh))

        @jax.jit
        def distill_step(state, teacher_params, batch, rng, n_steps):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(p):
                loss, m = model.distillation_loss_on_batch(
                    p, teacher_params, rng, batch["images"], {}, n_steps
                )
                return loss, m

            (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    opt_state=opt_state,
                ),
                loss,
            )

        for step in range(args.steps_per_iteration):
            batch = shard_batch({"images": next(batches)["images"]}, mesh)
            student, loss = distill_step(
                student, teacher, batch, rng, jnp.int32(n)
            )
            if step % 100 == 0:
                logger.log(
                    iteration * args.steps_per_iteration + step,
                    {"loss": loss, "N": n},
                )

        teacher_params = student.params
        checkpoints.save_checkpoint(
            os.path.join(args.output_path, f"checkpoints_N{n}"),
            student,
            (iteration + 1) * args.steps_per_iteration,
        )
        print(f"saved distilled model @ N={n}", flush=True)
    logger.close()


if __name__ == "__main__":
    main()
