"""Frozen CLIP text conditioning.

Counterpart of /root/reference/xdiffusion/layers/clip.py:18-230
(FrozenCLIPEmbedder + FrozenCLIPTextTokenizer wrapping HF transformers).
Offline-first: when the HF CLIP assets are cached locally the real flax
model is used; otherwise tokenization falls back to byte-BPE and
embeddings to the deterministic hash space (same contracts).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np


class FrozenCLIPTextTokenizer:
    """prompts -> context["text_tokens"] with the CLIP vocabulary."""

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77, **kwargs):
        self.max_length = int(max_length)
        self._tokenizer = None
        try:
            from transformers import CLIPTokenizer

            self._tokenizer = CLIPTokenizer.from_pretrained(
                version, local_files_only=True
            )
        except Exception:
            from xdiffusion_tpu.tokenizer import get_encoder

            self._bpe = get_encoder()

    def tokenize(self, texts: List[str]) -> np.ndarray:
        if self._tokenizer is not None:
            out = self._tokenizer(
                texts,
                max_length=self.max_length,
                padding="max_length",
                truncation=True,
                return_tensors="np",
            )
            return out["input_ids"].astype(np.int32)
        return self._bpe.tokenize(texts, self.max_length) % 49408

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if "text_prompts" not in context or "text_tokens" in context:
            return context
        new_context = dict(context)
        new_context["text_tokens"] = jnp.asarray(
            self.tokenize(list(context["text_prompts"]))
        )
        return new_context


class FrozenCLIPEmbedder:
    """prompts -> context["text_embeddings"] (B, 77, 768) via frozen CLIP;
    deterministic hash fallback offline."""

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77, embedding_dim: int = 768, **kwargs):
        self.max_length = int(max_length)
        self.embedding_dim = int(embedding_dim)
        self._model = None
        self._tokenizer = None
        try:
            from transformers import CLIPTokenizer, FlaxCLIPTextModel

            self._tokenizer = CLIPTokenizer.from_pretrained(
                version, local_files_only=True
            )
            self._model = FlaxCLIPTextModel.from_pretrained(
                version, local_files_only=True
            )
        except Exception:
            from xdiffusion_tpu.layers.embedding import _HashEmbedFallback

            self._fallback = _HashEmbedFallback(
                self.max_length, self.embedding_dim
            )

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if "text_prompts" not in context or "text_embeddings" in context:
            return context
        new_context = dict(context)
        prompts = list(context["text_prompts"])
        if self._model is not None:
            tokens = self._tokenizer(
                prompts,
                max_length=self.max_length,
                padding="max_length",
                truncation=True,
                return_tensors="np",
            )
            out = self._model(input_ids=tokens["input_ids"])
            new_context["text_embeddings"] = out.last_hidden_state
        else:
            new_context["text_embeddings"] = jnp.asarray(
                np.stack([self._fallback(t) for t in prompts])
            )
        return new_context
