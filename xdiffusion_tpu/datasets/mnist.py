"""MNIST (and inverted variant) dataset.

Counterpart of /root/reference/xdiffusion/datasets/mnist.py:9-96. Reads
IDX archives from disk when available; otherwise serves the deterministic
synthetic stand-in (see datasets/synthetic.py). Images are bilinearly
resized once at load to the configured spatial size and held in memory as
uint8; batches convert to float32 [0,1] on the way out.
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Callable, List, Optional, Tuple

import numpy as np


def data_root() -> str:
    return os.environ.get(
        "XDIFFUSION_DATA_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data"),
    )


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def _find_idx(base: str, names: List[str]) -> Optional[str]:
    for name in names:
        for suffix in ("", ".gz"):
            p = os.path.join(base, name + suffix)
            if os.path.exists(p):
                return p
    return None


def _load_real_mnist(split: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    base_candidates = [
        os.path.join(data_root(), "mnist"),
        os.path.join(data_root(), "MNIST", "raw"),
    ]
    prefix = "train" if split == "train" else "t10k"
    for base in base_candidates:
        img_p = _find_idx(base, [f"{prefix}-images-idx3-ubyte", f"{prefix}-images.idx3-ubyte"])
        lab_p = _find_idx(base, [f"{prefix}-labels-idx1-ubyte", f"{prefix}-labels.idx1-ubyte"])
        if img_p and lab_p:
            images = _read_idx(img_p)[..., None]  # (N, 28, 28, 1)
            labels = _read_idx(lab_p).astype(np.int32)
            return images, labels
    return None


def _resize_bilinear(images: np.ndarray, size: int) -> np.ndarray:
    """One-time host resize (N, H, W, 1) uint8 -> (N, size, size, 1) uint8."""
    if images.shape[1] == size:
        return images
    import jax
    import jax.numpy as jnp

    out = jax.image.resize(
        jnp.asarray(images, dtype=jnp.float32),
        (images.shape[0], size, size, images.shape[3]),
        method="bilinear",
    )
    return np.asarray(jnp.clip(out, 0, 255)).astype(np.uint8)


class MNIST:
    """In-memory image dataset: uint8 (N, S, S, 1) + int labels."""

    num_classes = 10

    def __init__(
        self,
        split: str = "train",
        image_size: int = 32,
        invert: bool = False,
        num_synthetic: int = 60000,
    ):
        real = _load_real_mnist(split)
        if real is not None:
            images, labels = real
            self.synthetic = False
        else:
            from xdiffusion_tpu.datasets.synthetic import generate_digits

            seed = 0 if split == "train" else 1
            n = num_synthetic if split == "train" else max(1, num_synthetic // 6)
            images, labels = generate_digits(n, seed=seed)
            self.synthetic = True
        images = _resize_bilinear(images, image_size)
        if invert:
            images = 255 - images
        self.images = images
        self.labels = labels

    def __len__(self) -> int:
        return self.images.shape[0]

    def __getitem__(self, idx) -> Tuple[np.ndarray, int]:
        return (
            self.images[idx].astype(np.float32) / 255.0,
            int(self.labels[idx]),
        )


# Two textual surface forms per digit, matching the reference's
# label->prompt behavior (datasets/mnist.py:65).
_TEXT_FORMS = [
    ["zero", "0"],
    ["one", "1"],
    ["two", "2"],
    ["three", "3"],
    ["four", "4"],
    ["five", "5"],
    ["six", "6"],
    ["seven", "7"],
    ["eight", "8"],
    ["nine", "9"],
]


def convert_labels_to_prompts(labels: np.ndarray) -> List[str]:
    """Random surface form per label, e.g. 3 -> 'three' or '3'."""
    labels = np.asarray(labels)
    rng = np.random.default_rng()
    picks = rng.integers(0, 2, size=labels.shape[0])
    return [_TEXT_FORMS[int(l)][int(p)] for l, p in zip(labels, picks)]
