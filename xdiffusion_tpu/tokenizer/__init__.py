"""Text tokenizer (GPT-2 style byte-BPE with an offline fallback)."""

from xdiffusion_tpu.tokenizer.bpe import Encoder, get_encoder  # noqa: F401
