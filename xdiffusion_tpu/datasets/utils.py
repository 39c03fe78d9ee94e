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
