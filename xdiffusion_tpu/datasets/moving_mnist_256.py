"""Labeled Moving-MNIST-256: the downloaded 2-digit dataset variant.

Counterpart of /root/reference/xdiffusion/datasets/moving_mnist_256.py:
21-218 — a DISTINCT dataset from the synthetic generator: 100 videos x
30 frames of 256x256 content with TWO digits per video, stored as
`MovingMNIST256/videos_data.npz` (flat (N*F, 256, 256) uint8) +
`labels_data.npz` ((N*F, 2) digit labels), resized once to the
configured training size (the reference resizes through torchvision
transforms at load). Prompts render both digits ("three and 7").

Offline fallback: the bouncing-digit synthesizer at native 256
resolution with digits_per_video=2 and 30 frames, so the pipeline runs
end to end with the same shapes; `synthetic` records which path loaded.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from xdiffusion_tpu.datasets.mnist import data_root
from xdiffusion_tpu.datasets.moving_mnist import (
    convert_labels_to_prompts as _base_prompts,
    synthesize_moving_mnist,
)

NATIVE_SIZE = 256
NATIVE_FRAMES = 30
DIGITS_PER_VIDEO = 2


def _load_archive():
    for root in (data_root(), "."):
        vpath = os.path.join(root, "MovingMNIST256", "videos_data.npz")
        lpath = os.path.join(root, "MovingMNIST256", "labels_data.npz")
        if os.path.exists(vpath) and os.path.exists(lpath):
            with np.load(vpath, allow_pickle=True) as npz:
                videos = npz[npz.files[0]]
            with np.load(lpath, allow_pickle=True) as npz:
                labels = npz[npz.files[0]]
            n = videos.shape[0] // NATIVE_FRAMES
            videos = np.asarray(videos, dtype=np.uint8).reshape(
                n, NATIVE_FRAMES, NATIVE_SIZE, NATIVE_SIZE, 1
            )
            labels = np.asarray(labels).reshape(n, NATIVE_FRAMES, -1)[:, 0, :]
            return videos, labels.astype(np.int32)
    return None


def _resize_videos(videos: np.ndarray, size: int) -> np.ndarray:
    """(N, F, S, S, 1) uint8 -> (N, F, size, size, 1) uint8, bilinear."""
    if videos.shape[2] == size:
        return videos
    import jax
    import jax.numpy as jnp

    n, f, s, _, c = videos.shape
    flat = videos.reshape(n * f, s, s, c)
    out = []
    # Chunked to bound host memory for the 256^2 frames.
    for start in range(0, flat.shape[0], 512):
        chunk = jnp.asarray(flat[start : start + 512], jnp.float32)
        r = jax.image.resize(
            chunk, (chunk.shape[0], size, size, c), method="bilinear"
        )
        out.append(np.asarray(jnp.clip(r, 0, 255)).astype(np.uint8))
    return np.concatenate(out).reshape(n, f, size, size, c)


class MovingMNIST256:
    """In-memory video dataset: uint8 (N, F, S, S, 1) + (N, 2) labels."""

    num_classes = 10

    def __init__(
        self,
        split: str = "train",
        image_size: int = 64,
        num_videos: int = 100,
    ):
        assert split == "train", "the 256 variant ships a train split only"
        real = _load_archive()
        if real is not None:
            videos, labels = real
            self.synthetic = False
        else:
            videos, labels = synthesize_moving_mnist(
                num_videos,
                num_frames=NATIVE_FRAMES,
                image_size=NATIVE_SIZE,
                digits_per_video=DIGITS_PER_VIDEO,
                seed=0,
            )
            self.synthetic = True
        self.videos = _resize_videos(videos, image_size)
        self.labels = labels

    def __len__(self) -> int:
        return self.videos.shape[0]

    def __getitem__(self, idx):
        return (
            self.videos[idx].astype(np.float32) / 255.0,
            self.labels[idx],
        )


def convert_labels_to_prompts(labels: np.ndarray) -> List[str]:
    """(B, 2) labels -> 'three and 7' style prompts (reference
    moving_mnist_256.py:187-215)."""
    return _base_prompts(labels)
