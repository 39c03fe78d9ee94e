"""CLI: train audio (mel-spectrogram) diffusion on UrbanSound8k
(reference command surface: training/audio/urbansound8k/train.py:34,
including --autoencoder_checkpoint for latent-space audio diffusion)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))


def main():
    p = argparse.ArgumentParser(description="Train audio diffusion.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--num_training_steps", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--dataset_name", type=str, default="audio/urbansound8k")
    p.add_argument("--output_path", type=str, default="output")
    p.add_argument("--save_and_sample_every_n", type=int, default=1000)
    p.add_argument("--autoencoder_checkpoint", type=str, default="")
    p.add_argument("--resume_from", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from xdiffusion_tpu.training.image.train import train

    # Mel-spectrograms train exactly like images; the audio-specific
    # parts are the dataset (mel pipeline) and the optional latent encoder
    # loaded inside train() via vae_checkpoint.
    train(
        config_path=args.config_path,
        num_training_steps=args.num_training_steps,
        batch_size=args.batch_size,
        dataset_name=args.dataset_name,
        output_path=args.output_path,
        save_and_sample_every_n=args.save_and_sample_every_n,
        resume_from=args.resume_from or None,
        vae_checkpoint=args.autoencoder_checkpoint or None,
        seed=args.seed,
    )


if __name__ == "__main__":
    main()
