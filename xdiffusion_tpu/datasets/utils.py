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
    if dataset_name == "video/moving_mnist":
        from xdiffusion_tpu.datasets import moving_mnist

        return (
            moving_mnist.MovingMNIST(split=split, image_size=image_size),
            moving_mnist.convert_labels_to_prompts,
        )
    if dataset_name == "video/moving_mnist_256":
        # Distinct 2-digit 256-native dataset (reference datasets/
        # moving_mnist_256.py), resized to the configured training size.
        from xdiffusion_tpu.datasets import moving_mnist_256

        return (
            moving_mnist_256.MovingMNIST256(
                split=split, image_size=image_size
            ),
            moving_mnist_256.convert_labels_to_prompts,
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
    if dataset_name == "image/mnist_embedded_gemma_2":
        from xdiffusion_tpu.datasets import mnist_embedded_gemma_2 as mg

        return (
            mg.MNISTEmbeddedGemma2(split=split, image_size=image_size),
            mg.convert_labels_to_prompts,
        )
    if dataset_name in ("audio/urbansound8k", "urbansound8k"):
        from xdiffusion_tpu.datasets import urbansound8k

        return (
            urbansound8k.UrbanSound8k(split=split, image_size=image_size),
            urbansound8k.convert_labels_to_prompts,
        )
    if dataset_name == "image/cifar10":
        return (
            mnist_cifar10(split, image_size),
            cifar10_prompts,
        )
    raise NotImplementedError(f"Dataset {dataset_name!r} not implemented yet.")


_CIFAR_CLASSES = [
    ["airplane", "plane"],
    ["automobile", "car"],
    ["bird", "bird"],
    ["cat", "cat"],
    ["deer", "deer"],
    ["dog", "dog"],
    ["frog", "frog"],
    ["horse", "horse"],
    ["ship", "ship"],
    ["truck", "truck"],
]


def cifar10_prompts(labels):
    rng = np.random.default_rng()
    picks = rng.integers(0, 2, size=len(labels))
    return [_CIFAR_CLASSES[int(l)][int(p)] for l, p in zip(labels, picks)]


def mnist_cifar10(split: str, image_size: int):
    """CIFAR-10 from pickled batches if present, else a synthetic RGB
    stand-in (colored digit glyphs) with the same shape/classes."""
    import os
    import pickle

    from xdiffusion_tpu.datasets import mnist as mnist_mod

    base = os.path.join(mnist_mod.data_root(), "cifar-10-batches-py")
    ds = mnist_mod.MNIST.__new__(mnist_mod.MNIST)
    if os.path.isdir(base):
        files = (
            [f"data_batch_{i}" for i in range(1, 6)]
            if split == "train"
            else ["test_batch"]
        )
        images, labels = [], []
        for name in files:
            with open(os.path.join(base, name), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            images.append(
                d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
            )
            labels.append(np.asarray(d[b"labels"], dtype=np.int32))
        ds.images = np.concatenate(images)
        ds.labels = np.concatenate(labels)
        ds.synthetic = False
    else:
        from xdiffusion_tpu.datasets.synthetic import generate_digits

        grey, labels = generate_digits(
            10000 if split == "train" else 1000,
            seed=2 if split == "train" else 3,
            image_size=32,
        )
        rng = np.random.default_rng(4)
        colors = rng.uniform(0.4, 1.0, size=(grey.shape[0], 1, 1, 3))
        ds.images = (grey.astype(np.float32) * colors).astype(np.uint8)
        ds.labels = labels
        ds.synthetic = True
    if image_size != 32:
        ds.images = mnist_mod._resize_bilinear(ds.images, image_size)
    ds.num_classes = 10
    return ds


def prefetch(iterator, depth: int = 2):
    """Background-thread prefetch: host batch assembly overlaps the device
    step (the TPU-native counterpart of torch DataLoader workers). The
    thread fills a bounded queue; numpy/native gather work runs with the
    GIL released."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def fill():
        try:
            for item in iterator:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface producer errors to the consumer
            q.put(e)

    t = threading.Thread(target=fill, daemon=True)
    t.start()

    def gen():
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    return gen()


def batch_iterator(
    dataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite epoch-shuffled iterator of static-shape numpy batches.
    Gather + normalize run through the native batch assembler
    (xdiffusion_tpu/native) when available."""
    from xdiffusion_tpu.native import gather_normalize

    n = len(dataset)
    assert batch_size <= n, f"batch {batch_size} > dataset {n}"
    rng = np.random.default_rng(seed)
    images = np.ascontiguousarray(dataset.images)  # uint8 (N, S, S, C)
    labels = dataset.labels
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            yield {
                "images": gather_normalize(images, idx),
                "classes": labels[idx].astype(np.int32),
            }
