"""CLAP text embedder (frozen audio-text conditioning).

Counterpart of /root/reference/xdiffusion/layers/clap.py:18-69 (which
wraps msclap's pretrained CLAP 2023 text encoder: a GPT-2 backbone whose
last-token hidden state is projected to the joint audio-text space).

Real-weights path: when `laion/clap-htsat-unfused`-style weights (or the
version passed in the config) are cached locally, the HF ClapTextModel
WithProjection runs through transformers (torch CPU, frozen, host-side —
conditioning embeddings are computed once per unique prompt and cached,
so this is off the train step's hot path). Without cached weights the
embedder degrades to a deterministic hash-seeded pseudo-embedding with
the same (B, embedding_dim) contract.

Fidelity note: HF CLAP and msclap's CLAP-2023 share the contract but NOT
the pretrained embedding space, so audio checkpoints conditioned through
one are not numerically cross-compatible with the other — retrain (or
re-finetune the conditioning pathway) when importing reference audio
checkpoints. Swap `version` to a local msclap export to close the gap.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp


class FrozenCLAPTextEmbedder:
    _loaded = {}

    def __init__(
        self,
        embedding_dim: int = 1024,
        version: str = "laion/clap-htsat-unfused",
        **kwargs,
    ):
        self.embedding_dim = int(embedding_dim)
        self.version = version
        self._cache: Dict[str, np.ndarray] = {}

    @classmethod
    def _load(cls, version: str):
        if version not in cls._loaded:
            try:
                from transformers import (
                    AutoTokenizer,
                    ClapTextModelWithProjection,
                )

                model = ClapTextModelWithProjection.from_pretrained(
                    version, local_files_only=True
                ).eval()
                tok = AutoTokenizer.from_pretrained(
                    version, local_files_only=True
                )
                cls._loaded[version] = (model, tok)
            except Exception:
                cls._loaded[version] = None
        return cls._loaded[version]

    def _embed_real(self, prompts) -> Optional[np.ndarray]:
        loaded = self._load(self.version)
        if loaded is None:
            return None
        import torch

        model, tok = loaded
        todo = [p for p in prompts if p not in self._cache]
        if todo:
            enc = tok(list(todo), padding=True, return_tensors="pt")
            with torch.no_grad():
                out = model(**enc).text_embeds.numpy()
            for i, p in enumerate(todo):
                self._cache[p] = out[i]
        return np.stack([self._cache[p] for p in prompts])

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
        prompts = list(context["text_prompts"])
        emb = self._embed_real(prompts)
        if emb is None:
            emb = np.stack([self._embed_one(t) for t in prompts])
        new_context["clap_embeddings"] = jnp.asarray(emb)
        return new_context
