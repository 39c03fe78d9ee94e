"""CLI: train a video diffusion model (reference command surface:
training/video/train.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from xdiffusion_tpu.training.video.train import train


def main():
    p = argparse.ArgumentParser(description="Train a video diffusion model.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--num_training_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dataset_name", type=str, default="video/moving_mnist")
    p.add_argument("--output_path", type=str, default="output")
    p.add_argument("--save_and_sample_every_n", type=int, default=1000)
    p.add_argument("--joint_image_video_training_step", type=int, default=-1)
    p.add_argument("--resume_from", type=str, default="")
    p.add_argument("--load_model_weights_from_checkpoint", type=str, default="")
    p.add_argument("--load_vae_weights_from_checkpoint", type=str, default="")
    p.add_argument(
        "--train_temporal_modules_only",
        action="store_true",
        help="freeze the transferred 2D backbone; train only temporal "
        "modules (needs --load_model_weights_from_checkpoint)",
    )
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--force_cpu", action="store_true")
    p.add_argument("--sampling_steps", type=int, default=0,
                   help="respaced sampling steps for preview grids "
                        "(0 = the scheduler's full ladder)")
    args = p.parse_args()

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    train(
        config_path=args.config_path,
        num_training_steps=args.num_training_steps,
        batch_size=args.batch_size,
        dataset_name=args.dataset_name,
        output_path=args.output_path,
        save_and_sample_every_n=args.save_and_sample_every_n,
        joint_image_video_training_step=args.joint_image_video_training_step,
        resume_from=args.resume_from or None,
        train_temporal_modules_only=args.train_temporal_modules_only,
        load_model_weights_from_checkpoint=(
            args.load_model_weights_from_checkpoint or None
        ),
        load_vae_weights_from_checkpoint=(
            args.load_vae_weights_from_checkpoint or None
        ),
        num_samples=args.num_samples,
        sampling_steps=args.sampling_steps,
        seed=args.seed,
    )


if __name__ == "__main__":
    main()
