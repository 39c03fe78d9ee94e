"""HunyuanVideo text encoders (reference:
xdiffusion/layers/hunyuan_video/text_encoder.py).

The reference runs a frozen LLaVA-LLaMA MLLM (sequence states) and a
frozen CLIP-L (pooled state). Neither checkpoint is available offline, so
both degrade to deterministic hash-seeded embeddings that preserve the
shape contracts and key names; drop in the real encoders when cached.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from xdiffusion_tpu.layers.embedding import _HashEmbedFallback

_TYPE_DIMS = {"llava_llm": 4096, "clipL": 768}


class TextEncoder:
    host_side = True

    def __init__(
        self,
        model: str = "",
        text_encoder_type: str = "llava_llm",
        max_length: int = 256,
        hidden_state_skip_layer: int = 2,
        prompt_template: Optional[str] = None,
        prompt_template_video: Optional[str] = None,
        context_input_key: str = "text_prompts",
        context_output_key: Optional[str] = None,
        embedding_dim: Optional[int] = None,
        **kwargs,
    ):
        self.encoder_type = text_encoder_type
        self.pooled = text_encoder_type == "clipL"
        self.input_key = context_input_key
        self.output_key = context_output_key or (
            "clip_text_embeddings" if self.pooled else "text_embeddings"
        )
        dim = int(embedding_dim or _TYPE_DIMS.get(text_encoder_type, 768))
        length = 1 if self.pooled else int(max_length)
        self._fallback = _HashEmbedFallback(length, dim)

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if self.input_key not in context or self.output_key in context:
            return context
        import numpy as np

        prompts = list(context[self.input_key])
        emb = np.stack([self._fallback(t) for t in prompts])
        if self.pooled:
            emb = emb[:, 0]
        new_context = dict(context)
        new_context[self.output_key] = jnp.asarray(emb)
        return new_context
