"""Train the perceptual-loss feature pyramid and save the filter bank.

The FID-LeNet recipe applied to the LPIPS gap (reference VGG-LPIPS,
/root/reference/xdiffusion/autoencoders/losses.py:556-671, needs
pretrained VGG16 weights this offline box can't download): train the
same conv geometry `perceptual_distance` uses as a digit classifier, so
its features carry semantic structure, and save the filters where the
loss picks them up automatically.

Default output: xdiffusion_tpu/autoencoders/assets/perceptual_filters.npz
(the shipped bank). Prints one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_name", type=str, default="image/mnist")
    p.add_argument("--num_images", type=int, default=8192)
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--output",
        type=str,
        default=os.path.join(
            os.path.dirname(__file__),
            "..",
            "xdiffusion_tpu",
            "autoencoders",
            "assets",
            "perceptual_filters.npz",
        ),
    )
    args = p.parse_args()

    import numpy as np

    from xdiffusion_tpu.autoencoders.perceptual import (
        save_filters,
        train_perceptual_filters,
    )
    from xdiffusion_tpu.datasets.utils import load_dataset

    dataset, _ = load_dataset(args.dataset_name, split="train")
    rng = np.random.default_rng(args.seed)
    idx = rng.permutation(len(dataset))[: args.num_images]
    images = dataset.images[idx].astype(np.float32) / 255.0
    if images.ndim == 3:
        images = images[..., None]
    labels = dataset.labels[idx]

    filters, loss = train_perceptual_filters(
        images, labels, steps=args.steps, seed=args.seed
    )
    save_filters(os.path.abspath(args.output), filters)
    print(
        json.dumps(
            {
                "output": os.path.abspath(args.output),
                "final_train_loss": round(loss, 4),
                "num_images": int(len(images)),
                "steps": args.steps,
                "synthetic_data": bool(getattr(dataset, "synthetic", True)),
            }
        )
    )


if __name__ == "__main__":
    main()
