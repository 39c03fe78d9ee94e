"""CLI: synthesize a labeled Moving-MNIST dataset to .npz
(reference tool surface: tools/create_moving_mnist.py:174)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Create a Moving-MNIST dataset.")
    p.add_argument("--num_videos", type=int, default=10000)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--digits_per_video", type=int, default=1)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--output_path", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from xdiffusion_tpu.datasets.mnist import data_root
    from xdiffusion_tpu.datasets.moving_mnist import synthesize_moving_mnist

    videos, labels = synthesize_moving_mnist(
        args.num_videos,
        num_frames=args.num_frames,
        image_size=args.image_size,
        digits_per_video=args.digits_per_video,
        seed=args.seed,
    )
    out_dir = args.output_path or os.path.join(data_root(), "moving_mnist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"moving_mnist_{args.split}.npz")
    np.savez_compressed(out, videos=videos, labels=labels)
    print(f"wrote {out}: videos {videos.shape}, labels {labels.shape}")


if __name__ == "__main__":
    main()
