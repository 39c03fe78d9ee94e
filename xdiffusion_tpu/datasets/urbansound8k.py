"""UrbanSound8k mel-spectrogram dataset.

Counterpart of /root/reference/xdiffusion/datasets/urbansound8k.py:12
(which reads precomputed mel-spec tensors built by tools/create_mel_spec.py).
Offline-first: loads {data_root}/urbansound8k/melspec_{split}.npz when
present; otherwise synthesizes class-colored tone/noise clips and converts
them through the real wav->mel pipeline, preserving shapes and the
label->prompt mapping.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from xdiffusion_tpu.datasets.mnist import data_root

CLASS_NAMES = [
    "air conditioner",
    "car horn",
    "children playing",
    "dog bark",
    "drilling",
    "engine idling",
    "gun shot",
    "jackhammer",
    "siren",
    "street music",
]


def synthesize_clips(
    num_clips: int, sample_rate: int = 22050, duration: float = 1.0, seed: int = 0
):
    """Class-dependent tones + noise: (N, T) float32, labels (N,)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sample_rate * duration)) / sample_rate
    clips = np.zeros((num_clips, t.shape[0]), dtype=np.float32)
    labels = rng.integers(0, 10, size=num_clips).astype(np.int32)
    for i, lab in enumerate(labels):
        f0 = 110.0 * (2 ** (lab / 3.0))  # distinct base pitch per class
        tone = 0.5 * np.sin(2 * np.pi * f0 * t)
        tone += 0.25 * np.sin(2 * np.pi * 2 * f0 * t + rng.uniform(0, np.pi))
        am = 1.0 + 0.5 * np.sin(2 * np.pi * rng.uniform(1, 8) * t)
        noise = rng.normal(scale=0.05, size=t.shape)
        clips[i] = (tone * am + noise).astype(np.float32)
    return clips, labels


class UrbanSound8k:
    """In-memory mel-spectrogram dataset: float32 (N, S, S, 1) in [0,1]."""

    num_classes = 10

    def __init__(self, split: str = "train", image_size: int = 32,
                 num_synthetic: int = 512):
        path = os.path.join(
            data_root(), "urbansound8k", f"melspec_{split}.npz"
        )
        if os.path.exists(path):
            data = np.load(path)
            mels, labels = data["mels"], data["labels"]
            self.synthetic = False
        else:
            mels, labels = self._synthesize(split, image_size, num_synthetic)
            self.synthetic = True
        self.images = (np.clip(mels, 0, 1) * 255).astype(np.uint8)
        self.labels = labels

    @staticmethod
    def _synthesize(split: str, image_size, n: int):
        import jax.numpy as jnp

        from xdiffusion_tpu.layers.audio import mel_to_logmel, wav_to_mel

        # Square int (diffusion configs: 32) or [frames, n_mels] (the VAE
        # config trains on 64x128 log-mel rectangles).
        if isinstance(image_size, (list, tuple)):
            n_frames, n_mels = int(image_size[0]), int(image_size[1])
        else:
            n_frames = n_mels = int(image_size)
        seed = 0 if split == "train" else 1
        clips, labels = synthesize_clips(n, seed=seed)
        mels = []
        for clip in clips:
            m = wav_to_mel(clip, n_mels=n_mels)  # (frames, n_mels)
            m = mel_to_logmel(m)
            # Clip/pad frames to the target spectrogram "image".
            frames = m.shape[0]
            if frames >= n_frames:
                m = m[:n_frames]
            else:
                m = jnp.pad(m, ((0, n_frames - frames), (0, 0)))
            mels.append(np.asarray(m))
        mels = np.stack(mels)[..., None]  # (N, S, S, 1)
        return mels.astype(np.float32), labels

    def __len__(self):
        return self.images.shape[0]

    def __getitem__(self, idx):
        return self.images[idx].astype(np.float32) / 255.0, int(self.labels[idx])


def convert_labels_to_prompts(labels: np.ndarray) -> List[str]:
    return [CLASS_NAMES[int(l)] for l in np.asarray(labels).reshape(-1)]
