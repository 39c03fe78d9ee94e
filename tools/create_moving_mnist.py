"""CLI: synthesize a labeled Moving-MNIST dataset.

Command surface of the reference tool (tools/create_moving_mnist.py:
--dest/--filetype/--frame_size/--num_frames/--num_images/--original_size/
--nums_per_image) plus this repo's earlier flags. Digits follow bouncing
trajectories with per-video digit labels (the reference's labeled-
trajectory scheme, reference :195-275); with --reference_layout the output
is the MovingMNIST256-style archive pair (videos_data.npz flat
(N*F, S, S) uint8 stream + labels_data.npz) that
datasets/moving_mnist.py:_load_real consumes directly.

The reference tool composites real downloaded MNIST digits; offline this
uses the synthetic glyph set (same trajectories/labels contract).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Create a Moving-MNIST dataset.")
    # This repo's surface.
    p.add_argument("--num_videos", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--digits_per_video", type=int, default=None)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--output_path", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    # Reference tool surface.
    p.add_argument("--dest", type=str, default="")
    p.add_argument("--filetype", type=str, default="npz", choices=["npz"])
    p.add_argument("--frame_size", type=int, default=None)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--num_images", type=int, default=None)
    p.add_argument("--nums_per_image", type=int, default=None)
    p.add_argument(
        "--reference_layout",
        action="store_true",
        help="write MovingMNIST256-style videos_data.npz/labels_data.npz",
    )
    args = p.parse_args()

    num_videos = args.num_videos or args.num_images or 10000
    image_size = args.image_size or args.frame_size or 32
    digits = args.digits_per_video or args.nums_per_image or 1

    from xdiffusion_tpu.datasets.mnist import data_root
    from xdiffusion_tpu.datasets.moving_mnist import synthesize_moving_mnist

    videos, labels = synthesize_moving_mnist(
        num_videos,
        num_frames=args.num_frames,
        image_size=image_size,
        digits_per_video=digits,
        seed=args.seed,
    )
    out_dir = args.dest or args.output_path or os.path.join(
        data_root(), "moving_mnist"
    )
    os.makedirs(out_dir, exist_ok=True)
    if args.reference_layout:
        ref_dir = os.path.join(out_dir, "MovingMNIST256")
        os.makedirs(ref_dir, exist_ok=True)
        n, f, s, _, _ = videos.shape
        flat = videos[..., 0].reshape(n * f, s, s)
        per_frame = np.repeat(labels[:, None, :], f, axis=1).reshape(n * f, -1)
        np.savez_compressed(os.path.join(ref_dir, "videos_data.npz"), flat)
        np.savez_compressed(os.path.join(ref_dir, "labels_data.npz"), per_frame)
        print(
            f"wrote {ref_dir}: videos {flat.shape}, labels {per_frame.shape}"
        )
    else:
        out = os.path.join(out_dir, f"moving_mnist_{args.split}.npz")
        np.savez_compressed(out, videos=videos, labels=labels)
        print(f"wrote {out}: videos {videos.shape}, labels {labels.shape}")


if __name__ == "__main__":
    main()
