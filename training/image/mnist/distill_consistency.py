"""CLI: consistency distillation from a pretrained (EDM-style) teacher.

Reference command surface (training/image/mnist/distill_consistency.py:
498-504): --teacher_config_path, --student_config_path,
--teacher_checkpoint. The student consistency model learns Eq. 7 of
arXiv:2303.01469 against a frozen teacher's Heun solver.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser(description="Consistency distillation.")
    p.add_argument("--teacher_config_path", type=str, required=True)
    p.add_argument("--student_config_path", type=str, required=True)
    p.add_argument("--teacher_checkpoint", type=str, required=True)
    p.add_argument("--num_training_steps", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--dataset_name", type=str, default="image/mnist")
    p.add_argument("--output_path", type=str, default="output/consistency_distilled")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.datasets import load_dataset
    from xdiffusion_tpu.datasets.utils import batch_iterator
    from xdiffusion_tpu.diffusion.consistency import (
        GaussianDiffusion_ConsistencyModel,
    )
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import make_mesh, shard_batch
    from xdiffusion_tpu.parallel.mesh import replicated
    from xdiffusion_tpu.training.common import MetricsLogger
    from xdiffusion_tpu.training.image.train import build_model
    from xdiffusion_tpu.utils import normalize_to_neg_one_to_one

    teacher_model = build_model(load_yaml(args.teacher_config_path))
    student = GaussianDiffusion_ConsistencyModel(
        load_yaml(args.student_config_path)
    )

    mesh = make_mesh()
    dataset, _ = load_dataset(
        args.dataset_name, config=student.config(), split="train"
    )
    batches = batch_iterator(dataset, args.batch_size, seed=args.seed)

    # Teacher weights (frozen).
    from xdiffusion_tpu.parallel import create_train_state

    tx = default_optimizer().build()
    t_params = teacher_model.init_params(jax.random.PRNGKey(0))
    t_state = create_train_state(t_params, tx)
    t_state, _ = checkpoints.restore_checkpoint(
        args.teacher_checkpoint, t_state
    )
    teacher_params = jax.device_put(t_state.params, replicated(mesh))
    teacher_net = teacher_model.score_network()

    def teacher_denoise(x, sigma):
        return teacher_net.apply(teacher_params, x, sigma)

    params = student.init_params(jax.random.PRNGKey(args.seed))
    opt_state = tx.init(params["score"])
    params = jax.device_put(params, replicated(mesh))
    scale_fn = student.scale_fn(args.num_training_steps)

    @jax.jit
    def step_fn(params, opt_state, batch, rng, step, num_scales, target_ema):
        rng = jax.random.fold_in(rng, step)

        def loss_fn(score_params):
            full = dict(params)
            full["score"] = score_params
            loss, m = student.loss_on_batch(
                full,
                rng,
                batch["images"],
                {"num_scales": num_scales},
                teacher_denoise_fn=teacher_denoise,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params["score"])
        updates, opt_state = tx.update(grads, opt_state, params["score"])
        new_score = optax.apply_updates(params["score"], updates)
        new_params = student.update_auxiliary_params(
            {**params, "score": new_score}, target_ema, ema_rate=0.9999
        )
        return new_params, opt_state, loss

    os.makedirs(args.output_path, exist_ok=True)
    logger = MetricsLogger(args.output_path)
    rng = jax.random.PRNGKey(args.seed + 1)
    for step in range(args.num_training_steps):
        ema_rate, num_scales = scale_fn(step)
        batch = shard_batch({"images": next(batches)["images"]}, mesh)
        params, opt_state, loss = step_fn(
            params,
            opt_state,
            batch,
            rng,
            jnp.int32(step),
            jnp.int32(num_scales),
            jnp.float32(ema_rate),
        )
        if step % 100 == 0:
            logger.log(step, {"loss": loss, "num_scales": num_scales})
        if (step + 1) % 1000 == 0 or step + 1 == args.num_training_steps:
            from xdiffusion_tpu.training.common import save_image_grid

            samples = student.sample(
                params, jax.random.PRNGKey(step), num_samples=16
            )
            save_image_grid(
                np.asarray(samples),
                os.path.join(args.output_path, f"sample-{step+1}.png"),
            )
            from xdiffusion_tpu.parallel import TrainState

            checkpoints.save_checkpoint(
                os.path.join(args.output_path, "checkpoints"),
                TrainState(
                    step=jnp.int32(step + 1),
                    params=params,
                    opt_state=opt_state,
                ),
                step + 1,
            )
    logger.close()


if __name__ == "__main__":
    main()
