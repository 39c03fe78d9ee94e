"""CLI: train a KL-VAE with GAN losses (reference command surface:
training/video/autoencoder.py, generalized to image datasets)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from xdiffusion_tpu.training.image.autoencoder import train_autoencoder


def main():
    p = argparse.ArgumentParser(description="Train a VAE autoencoder.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--num_training_steps", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--dataset_name", type=str, default="image/mnist")
    p.add_argument("--output_path", type=str, default="output")
    p.add_argument("--save_and_sample_every_n", type=int, default=1000)
    p.add_argument("--learning_rate", type=float, default=4.5e-6)
    p.add_argument("--resume_from", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args()

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    train_autoencoder(
        config_path=args.config_path,
        num_training_steps=args.num_training_steps,
        batch_size=args.batch_size,
        dataset_name=args.dataset_name,
        output_path=args.output_path,
        save_and_sample_every_n=args.save_and_sample_every_n,
        learning_rate=args.learning_rate,
        resume_from=args.resume_from or None,
        seed=args.seed,
    )


if __name__ == "__main__":
    main()
