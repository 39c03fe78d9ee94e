"""MNIST with precomputed Gemma-2 text embeddings.

Counterpart of /root/reference/xdiffusion/datasets/
mnist_embedded_gemma_2.py:16-311 (which reads embeddings precomputed by
tools/create_mnist_embeddings_gemma_2.py). The context protocol: each
batch carries `text_embeddings` of shape (B, 300, 2304).

Offline-first: loads {data_root}/mnist_gemma2/embeddings.npz when present
(built by the tool against a local Gemma-2); otherwise uses deterministic
hash-seeded per-prompt embeddings. Embeddings are stored per PROMPT (20
surface forms over 10 digits), not per example, and gathered at batch time
— 20 x 300 x 2304 floats instead of 60000x.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Tuple

import numpy as np

from xdiffusion_tpu.datasets.mnist import _TEXT_FORMS, MNIST, data_root

EMBEDDING_TOKENS = 300
EMBEDDING_DIM = 2304


def _hash_embedding(text: str) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.sha256(text.encode("utf-8")).digest()[:8], "little"
    )
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(EMBEDDING_TOKENS, EMBEDDING_DIM)).astype(np.float32)
    return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)


class MNISTEmbeddedGemma2(MNIST):
    """MNIST images + per-class Gemma-2 prompt embeddings."""

    def __init__(self, split: str = "train", image_size: int = 32, **kwargs):
        super().__init__(split=split, image_size=image_size, **kwargs)
        path = os.path.join(data_root(), "mnist_gemma2", "embeddings.npz")
        if os.path.exists(path):
            data = np.load(path)
            # (10, 2, 300, 2304): [digit][surface form]
            self.prompt_embeddings = data["embeddings"].astype(np.float32)
            self.synthetic_embeddings = False
        else:
            self.prompt_embeddings = np.stack(
                [
                    np.stack([_hash_embedding(form) for form in forms])
                    for forms in _TEXT_FORMS
                ]
            )
            self.synthetic_embeddings = True

    def embeddings_for(
        self, labels: np.ndarray, rng: np.random.Generator = None
    ) -> np.ndarray:
        """(B,) labels -> (B, 300, 2304) embeddings (random surface form)."""
        rng = rng or np.random.default_rng()
        picks = rng.integers(0, self.prompt_embeddings.shape[1],
                             size=len(labels))
        return self.prompt_embeddings[np.asarray(labels), picks]


def convert_labels_to_prompts(labels):
    from xdiffusion_tpu.datasets.mnist import convert_labels_to_prompts as c

    return c(labels)
