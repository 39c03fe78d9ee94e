"""Dataset registry + batch iterator.

Counterpart of the reference registry (datasets/utils.py:8-91): names map
to (dataset, convert_labels_to_prompts) pairs. The batch iterator is the
host half of the input pipeline: epoch-shuffled numpy batching with
drop-remainder (static shapes for jit), producing dict batches that the
trainer places onto the device mesh.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Tuple

import numpy as np


def load_dataset(dataset_name: str, config=None, split: str = "train"):
    """Returns (dataset, convert_labels_to_prompts)."""
    image_size = 32
    if config is not None and "data" in config:
        image_size = config.data.image_size

    from xdiffusion_tpu.datasets import mnist

    if dataset_name in ("image/mnist", "mnist"):
        return (
            mnist.MNIST(split=split, image_size=image_size),
            mnist.convert_labels_to_prompts,
        )
    if dataset_name == "image/mnist_inverted":
        return (
            mnist.MNIST(split=split, image_size=image_size, invert=True),
            mnist.convert_labels_to_prompts,
        )
    if dataset_name in ("video/moving_mnist", "video/moving_mnist_256"):
        from xdiffusion_tpu.datasets import moving_mnist

        size = 256 if dataset_name.endswith("256") else image_size
        return (
            moving_mnist.MovingMNIST(split=split, image_size=size),
            moving_mnist.convert_labels_to_prompts,
        )
    if dataset_name in ("image/moving_mnist", "image/moving_mnist_inverted"):
        # Image view of moving-mnist: single frames.
        from xdiffusion_tpu.datasets import moving_mnist as mm

        ds = mm.MovingMNIST(split=split, image_size=image_size)
        frames = ds.videos[:, 0]  # (N, S, S, 1)
        if dataset_name.endswith("inverted"):
            frames = 255 - frames
        image_ds = mnist.MNIST.__new__(mnist.MNIST)
        image_ds.images = frames
        image_ds.labels = ds.labels[:, 0]
        image_ds.synthetic = ds.synthetic
        return image_ds, mnist.convert_labels_to_prompts
    raise NotImplementedError(f"Dataset {dataset_name!r} not implemented yet.")


def batch_iterator(
    dataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite epoch-shuffled iterator of static-shape numpy batches."""
    n = len(dataset)
    assert batch_size <= n, f"batch {batch_size} > dataset {n}"
    rng = np.random.default_rng(seed)
    images = dataset.images  # uint8 (N, S, S, C)
    labels = dataset.labels
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            yield {
                "images": images[idx].astype(np.float32) / 255.0,
                "classes": labels[idx].astype(np.int32),
            }
