"""Conditioning context pipeline.

The context is a plain dict flowing from the input pipeline through the
diffusion process into the score network (same protocol as the reference,
/root/reference/xdiffusion/context.py). Two execution domains:

- **Host-side context preprocessors** run before jit: they resolve
  list-typed signals (prompt strings -> token/embedding arrays). Everything
  that reaches a jitted program is a jax-compatible array.
- **Device-side adapters / input preprocessors** are pure functions on dicts
  of arrays and run inside the jitted loss/sampling programs (e.g. the CFG
  unconditional-context adapters, super-resolution channel concat).

Typical context keys: `timestep` (B,), `timestep_idx` (scalar, sampling
only), `logsnr_t`/`logsnr_s` (B,, continuous schedulers), `classes` (B,),
`text_prompts` (list[str], host only), `text_tokens` (B, L),
`text_embeddings` (B, L, D).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp


class Identity:
    """No-op adapter; registry target for `torch.nn.Identity` in configs."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, x=None, *args, **kwargs):
        return x


class NullContextAdapter:
    """Returns an empty conditioning signal."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, context: Dict, **kwargs):
        return None


class IgnoreContextAdapter:
    """Pass-through context preprocessor (reference: context.py:48)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, context: Dict, **kwargs) -> Dict:
        return context


class IgnoreInputPreprocessor:
    """Pass-through input preprocessor (reference: context.py:56)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, x, context: Dict = None, noise_scheduler=None, **kwargs):
        return x


class UnconditionalTextPromptsAdapter:
    """CFG adapter: empty-prompt conditioning.

    Host-side (pre-tokenization) it blanks the prompt strings; device-side
    (post-tokenization, inside the jitted loss) it zeroes the token ids —
    the empty prompt tokenizes to all padding, so the two are equivalent.
    """

    def __init__(self, **kwargs):
        pass

    def __call__(self, context: Dict, **kwargs) -> Dict:
        new_context = dict(context)
        if "text_prompts" in context:
            new_context["text_prompts"] = [""] * len(context["text_prompts"])
        if "text_tokens" in context:
            new_context["text_tokens"] = jnp.zeros_like(context["text_tokens"])
        # Frozen-encoder path (FrozenCLIPEmbedder/T5TextEmbedder): the
        # embeddings are already in the context; zero them device-side.
        for key in ("text_embeddings", "t5_text_embeddings",
                    "clip_text_embeddings"):
            if key in context and not isinstance(context[key], (list, tuple)):
                new_context[key] = jnp.zeros_like(context[key])
        return new_context


class UnconditionalClassesAdapter:
    """CFG adapter: maps all class labels to the learned NULL class id.

    The null id is `num_classes` (class-conditional score networks embed
    num_classes + 1 labels). Pure on arrays: safe inside jit.
    """

    def __init__(self, num_classes: int, **kwargs):
        self._num_classes = int(num_classes)

    def __call__(self, context: Dict, **kwargs) -> Dict:
        new_context = dict(context)
        classes = context["classes"]
        new_context["classes"] = jnp.zeros_like(classes) + self._num_classes
        return new_context


class TextPromptsPreprocessor:
    """Host-side: context["text_prompts"] (list[str]) -> context["text_tokens"]
    (B, text_context_size) int32 via byte-BPE (reference: context.py:180-206).

    Runs BEFORE jit so string signals never reach a traced program.
    """

    def __init__(self, text_context_size: int = 128, **kwargs):
        self._text_context_size = int(text_context_size)
        from xdiffusion_tpu.tokenizer import get_encoder

        self._encoder = get_encoder()

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if "text_prompts" not in context or "text_tokens" in context:
            return context
        new_context = dict(context)
        tokens = self._encoder.tokenize(
            context["text_prompts"], self._text_context_size
        )
        new_context["text_tokens"] = jnp.asarray(tokens)
        new_context.pop("text_prompts")
        return new_context


class SD3EncoderStack:
    """The three frozen SD3 text encoders + the joint-embedding recipe
    (reference context.py:284-345 / arXiv:2403.03206 §4):

    - sequence: penultimate CLIP hiddens concat channel-wise (77 x 2048),
      zero-padded along channels to the T5 width (or vice versa), then
      concat with the T5 hiddens along the sequence axis;
    - pooled: the two CLIP projected ("text_embeds") vectors concat.

    `clip1`/`clip2`/`t5` are (flax_module, params, tokenize_fn) triples
    where tokenize_fn(prompts, max_length) -> int32 ids (B, L) — built
    from HF assets by `for_pretrained`, or injected directly in tests.
    """

    def __init__(self, clip1, clip2, t5, clip1_len: int, clip2_len: int,
                 t5_len: int):
        self._clip1, self._clip2, self._t5 = clip1, clip2, t5
        self._lens = (int(clip1_len), int(clip2_len), int(t5_len))

    @classmethod
    def for_pretrained(
        cls, first: str, second: str, t5_name: str,
        clip1_len: int, clip2_len: int, t5_len: int,
    ):
        """Build from locally-cached HF checkpoints; None if any of the
        three towers is unavailable (never hits the network)."""
        from xdiffusion_tpu.layers.text_encoders import (
            CLIPTextTransformer,
            T5Encoder,
            load_pretrained_clip_text,
            load_pretrained_t5,
        )

        c1 = load_pretrained_clip_text(first, with_projection=True)
        c2 = load_pretrained_clip_text(second, with_projection=True)
        t5 = load_pretrained_t5(t5_name)
        if c1 is None or c2 is None or t5 is None:
            return None

        def clip_tok(tok):
            def fn(prompts, max_length):
                import numpy as np

                out = tok(
                    list(prompts), padding="max_length",
                    max_length=max_length, truncation=True, return_tensors="np",
                )
                return np.asarray(out["input_ids"], dtype=np.int32)

            return fn

        return cls(
            (CLIPTextTransformer(c1[0]), c1[1], clip_tok(c1[2])),
            (CLIPTextTransformer(c2[0]), c2[1], clip_tok(c2[2])),
            (T5Encoder(t5[0]), t5[1], clip_tok(t5[2])),
            clip1_len, clip2_len, t5_len,
        )

    def __call__(self, prompts: List[str]):
        import numpy as np

        l1, l2, lt = self._lens
        outs = []
        for (mod, params, tok), length in (
            (self._clip1, l1), (self._clip2, l2)
        ):
            ids = tok(prompts, length)
            seq, pooled = mod.apply(params, jnp.asarray(ids), penultimate=True)
            outs.append((np.asarray(seq), np.asarray(pooled)))
        t5_mod, t5_params, t5_tok = self._t5
        t5_seq = np.asarray(
            t5_mod.apply(t5_params, jnp.asarray(t5_tok(prompts, lt)))
        )

        clip_seq = np.concatenate([outs[0][0], outs[1][0]], axis=-1)
        dc, dt = clip_seq.shape[-1], t5_seq.shape[-1]
        if dt > dc:
            clip_seq = np.pad(clip_seq, ((0, 0), (0, 0), (0, dt - dc)))
        elif dc > dt:
            t5_seq = np.pad(t5_seq, ((0, 0), (0, 0), (0, dc - dt)))
        seq = np.concatenate([clip_seq, t5_seq], axis=-2)
        pooled = np.concatenate([outs[0][1], outs[1][1]], axis=-1)
        return seq.astype(np.float32), pooled.astype(np.float32)


class SD3TextPromptsPreprocessor:
    """Host-side: prompts -> SD3 joint text conditioning
    (reference: context.py:258-344 runs CLIP-L + CLIP-bigG + T5 frozen
    encoders and concatenates their embeddings).

    When all three towers' weights are cached locally (or an
    `encoders` SD3EncoderStack is injected), runs the real encoders.
    Offline fallback: emits deterministic hash-seeded embeddings with the
    same contract — context["text_embeddings"] (B, L, joint_dim) and
    context["pooled_text_embeddings"] (B, pooled_dim). Distinct prompts
    map to distinct stable vectors, so conditional structure still trains.
    """

    def __init__(
        self,
        first_clip_model_name: str = "openai/clip-vit-large-patch14",
        first_clip_max_length: int = 77,
        second_clip_model_name: str = "laion/CLIP-ViT-bigG-14-laion2B-39B-b160k",
        second_clip_max_length: int = 77,
        t5_model_name: str = "google/t5-v1_1-base",
        t5_max_length: int = 128,
        joint_dim: int = 2048,
        pooled_dim: int = 2048,
        encoders: "SD3EncoderStack | None" = None,
        **kwargs,
    ):
        self.first_clip_model_name = first_clip_model_name
        self.first_clip_max_length = int(first_clip_max_length)
        self.second_clip_model_name = second_clip_model_name
        self.second_clip_max_length = int(second_clip_max_length)
        self.t5_model_name = t5_model_name
        self.t5_max_length = int(t5_max_length)
        self.joint_dim = int(joint_dim)
        self.pooled_dim = int(pooled_dim)
        self._encoders = encoders
        self._load_attempted = encoders is not None

    def _encoder_stack(self):
        if not self._load_attempted:
            self._load_attempted = True
            self._encoders = SD3EncoderStack.for_pretrained(
                self.first_clip_model_name,
                self.second_clip_model_name,
                self.t5_model_name,
                self.first_clip_max_length,
                self.second_clip_max_length,
                self.t5_max_length,
            )
            if self._encoders is None:
                import logging

                logging.getLogger(__name__).warning(
                    "SD3 text encoders not cached locally "
                    "(%s / %s / %s); falling back to hash embeddings",
                    self.first_clip_model_name,
                    self.second_clip_model_name,
                    self.t5_model_name,
                )
        return self._encoders

    def _embed(self, text: str, length: int, dim: int):
        import hashlib

        import numpy as np

        seed = int.from_bytes(
            hashlib.sha256(text.encode("utf-8")).digest()[:8], "little"
        )
        rng = np.random.default_rng(seed)
        v = rng.normal(size=(length, dim)).astype(np.float32)
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if "text_prompts" not in context or "text_embeddings" in context:
            return context
        import numpy as np

        prompts = context["text_prompts"]
        stack = self._encoder_stack()
        if stack is not None:
            emb, pooled = stack(list(prompts))
        else:
            emb = np.stack(
                [
                    self._embed(t, self.t5_max_length, self.joint_dim)
                    for t in prompts
                ]
            )
            pooled = np.stack(
                [self._embed(t, 1, self.pooled_dim)[0] for t in prompts]
            )
        new_context = dict(context)
        new_context["text_embeddings"] = jnp.asarray(emb)
        new_context["pooled_text_embeddings"] = jnp.asarray(pooled)
        new_context.pop("text_prompts")
        return new_context


class TextTokenAdapter:
    """Conditioning-signal selector: yields the token batch."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, context: Dict, **kwargs):
        return context["text_tokens"]


class ContextEmbeddingAdapter:
    def __init__(self, **kwargs):
        pass

    def __call__(self, context: Dict, **kwargs):
        return context["context_embedding"]


class T5TextPromptsPreprocessor:
    """Host-side: context["text_prompts"] -> context["text_tokens"] with the
    T5 vocabulary contract (reference: context.py T5 prompt preprocessor;
    used by the Imagen configs). Uses the real T5 tokenizer when its files
    are cached locally, else the byte-BPE fallback folded into the T5 vocab
    range.
    """

    def __init__(
        self,
        max_length: int = 77,
        model_name: str = "google/t5-v1_1-base",
        **kwargs,
    ):
        self._max_length = int(max_length)
        self._tokenizer = None
        try:
            from transformers import AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(
                model_name, local_files_only=True
            )
        except Exception:
            from xdiffusion_tpu.tokenizer import get_encoder

            self._encoder = get_encoder()

    def __call__(self, context: Dict, **kwargs) -> Dict:
        if "text_prompts" not in context or "text_tokens" in context:
            return context
        import numpy as np

        prompts = list(context["text_prompts"])
        if self._tokenizer is not None:
            out = self._tokenizer(
                prompts,
                max_length=self._max_length,
                padding="max_length",
                truncation=True,
                return_tensors="np",
            )
            tokens = out["input_ids"].astype(np.int32)
        else:
            tokens = self._encoder.tokenize(prompts, self._max_length) % 32128
        new_context = dict(context)
        new_context["text_tokens"] = jnp.asarray(tokens)
        new_context.pop("text_prompts")
        return new_context


class TextTokenProjectionAdapter:
    """Context-transformer head: run the score network's `text_tokens`
    projection (e.g. T5TextTokensToEmbedding) and write the result to
    context["text_embeddings"]. A named shorthand for
    RunProjection(text_tokens -> text_embeddings)."""

    # Score networks dispatch (context, projections) to heads that declare
    # a projection_key (see score_networks/unet.py head dispatch).
    projection_key = "text_tokens"

    def __init__(self, **kwargs):
        pass

    def __call__(self, context: Dict, projections: Dict) -> Dict:
        new_context = dict(context)
        new_context["text_embeddings"] = projections["text_tokens"](
            context["text_tokens"], context
        )
        return new_context


class TextEmbeddingsAdapter:
    """Conditioning-signal selector for cross-attention: yields
    context["text_embeddings"] as (B, L, C).

    The reference's `swap_context_channels` flag exists because its text
    encoders emit channel-first tensors; embeddings here are (B, L, C)
    throughout, so the flag is accepted for config compatibility and is a
    no-op.
    """

    def __init__(self, swap_context_channels: bool = False, **kwargs):
        self.swap_context_channels = bool(swap_context_channels)

    def __call__(self, context: Dict, **kwargs):
        return context["text_embeddings"]


class SpatialBatchForVideo:
    """Reference-config compatibility shim (reference: context.py:466):
    the reference's video UNets fold frames into the batch and need
    per-video context tensors repeated per frame. The video UNets here
    tile every array context entry over frames automatically when folding
    (score_networks/unet_3d.py), so this head is a pass-through.
    """

    def __init__(self, input_context_key: str = "", num_frames: int = 0,
                 **kwargs):
        self._input_context_key = input_context_key

    def __call__(self, context: Dict, projections: Dict = None) -> Dict:
        return context


class CLIPTextPromptsPreprocessor:
    """Host-side: prompts -> context["text_tokens"] in the CLIP vocabulary
    (reference: context.py CLIP prompt preprocessor; used by the *_clip
    UNet configs). Real CLIP tokenizer when cached, byte-BPE folded into
    the CLIP vocab range otherwise.
    """

    def __init__(self, text_sequence_length: int = 77, **kwargs):
        from xdiffusion_tpu.layers.clip import FrozenCLIPTextTokenizer

        self._tokenizer = FrozenCLIPTextTokenizer(
            max_length=int(text_sequence_length)
        )

    def __call__(self, context: Dict, **kwargs) -> Dict:
        new_context = self._tokenizer(context)
        new_context.pop("text_prompts", None)
        return new_context


class UnconditionalEmbeddingAdapter:
    """CFG adapter for frozen-embedding conditioning (reference:
    context.py — Sana and friends): replaces the text embeddings with the
    null (zero) embedding of the configured shape. Pure on arrays."""

    def __init__(self, embedding_shape=None, **kwargs):
        self._shape = tuple(embedding_shape) if embedding_shape else None

    def __call__(self, context: Dict, **kwargs) -> Dict:
        new_context = dict(context)
        for key in ("text_embeddings", "t5_text_embeddings",
                    "clip_text_embeddings"):
            if key in context and hasattr(context[key], "shape"):
                new_context[key] = jnp.zeros_like(context[key])
        return new_context
