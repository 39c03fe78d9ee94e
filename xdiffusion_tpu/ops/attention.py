"""Multi-head attention dispatcher: Pallas flash attention on TPU, fused
XLA einsum otherwise.

Replaces the reference's reliance on torch SDPA / hand-rolled QKVAttention
(reference layers/attention.py:144-189). Two paths:

- `_xla_attention`: einsum QK^T -> fp32 softmax -> einsum V. For the short
  sequences of pixel-space diffusion (32x32 feature maps -> seq <= 1024 at
  the attention resolutions), XLA already emits a tight fused program; this
  path is also the reference implementation the Pallas kernel is tested
  against.
- `flash_attention` (ops/flash_attention.py): blocked online-softmax Pallas
  kernel used when sequence/head dims are large enough to be MXU-tile
  aligned and the platform is TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    is_causal: bool = False,
) -> jax.Array:
    """Reference attention. q: (B, H, Sq, D), k/v: (B, H, Sk, D)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if is_causal:
        sq, sk = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _flash_eligible(q: jax.Array, k: jax.Array) -> bool:
    """Flash kernel pays off when tiles fill the MXU and seq is long."""
    if jax.default_backend() != "tpu":
        return False
    *_, sq, d = q.shape
    sk = k.shape[-2]
    # Below these sizes the XLA path is already speed-of-light; the kernel's
    # block bookkeeping would only add overhead. Head dim must tile to 128.
    return sq >= 1024 and sk >= 1024 and d % 128 == 0


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    is_causal: bool = False,
    force_xla: bool = False,
) -> jax.Array:
    """Scaled dot-product attention over (B, H, S, D) tensors."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if not force_xla and _flash_eligible(q, k) and not is_causal:
        from xdiffusion_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale=scale, is_causal=is_causal)
