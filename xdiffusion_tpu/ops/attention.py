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

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Sequence parallelism: when a mesh with a 'sequence' axis is registered
# (trainer knob XDIFFUSION_MESH="data=2,sequence=4", or the
# `sequence_parallel` context in tests), self-attention calls route
# through the ring-attention shard_map (ops/ring_attention.py) so the
# token axis is sharded across devices and k/v shards ride the ICI ring.
# ---------------------------------------------------------------------------

_SEQ_CTX = {"mesh": None, "axis": "sequence"}


def set_sequence_parallel_mesh(mesh, axis_name: str = "sequence") -> None:
    """Register (or clear, with None) the process-wide sequence-parallel
    mesh. Trainers call this once after building their mesh."""
    _SEQ_CTX["mesh"] = mesh
    _SEQ_CTX["axis"] = axis_name


@contextlib.contextmanager
def sequence_parallel(mesh, axis_name: str = "sequence"):
    prev = dict(_SEQ_CTX)
    set_sequence_parallel_mesh(mesh, axis_name)
    try:
        yield
    finally:
        _SEQ_CTX.update(prev)


def _seq_parallel_mesh(b: int, sq: int, sk: int, is_causal: bool):
    """The registered mesh, when this call site can ring: non-causal
    SELF-attention (q/k same length) with token and batch axes divisible
    by the mesh axes."""
    mesh = _SEQ_CTX["mesh"]
    if mesh is None or is_causal:
        return None
    axis = _SEQ_CTX["axis"]
    if mesh.shape.get(axis, 1) <= 1:
        return None
    if sq != sk or sq % mesh.shape[axis] != 0:
        return None
    if b % mesh.shape.get("data", 1) != 0:
        return None
    return mesh


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
    """Flash kernel pays off when tiles fill the MXU and seq is long.

    Gate calibrated against the repo's long-sequence video-transformer
    shapes: LTX/Hunyuan at a 16x32x32 latent grid put 16384 tokens
    through self-attention at head_dim 64 (LTX dim_head 64, Hunyuan 128)
    — so the head-dim requirement is a 64-multiple (a half-width MXU
    tile; 128 stays the fast path), not the 128-multiple that excluded
    every shipped config.

    There is NO sequence-length cap: since the round-5 rewrite the k/v
    axis streams through the grid (innermost dimension + VMEM scratch
    accumulators, ops/flash_attention.py), so per-step VMEM is a few
    hundred KB at any length. Round 4's 4096 cap mis-attributed a crash:
    the failing program was the XLA BASELINE, whose fp32 (S, S) logits
    are h*S^2*4 bytes (8.6 GB at 8k d=64 h=32; 34 GB at 16k) — beyond
    ~8k tokens XLA cannot run these shapes at all.

    On-chip A/B (tools/flash_ab.py, v5e, bf16, min-of-6..10): 4k d=64
    1.11x fwd / 1.24x fwd+bwd; 4k d=128 1.48x / 1.56x; 8k d=128 36x
    fwd / 11.5x fwd+bwd; 16k d=128 1.55x fwd; 8k d=64 43.9 ms fwd /
    79.1 ms fwd+bwd and 16k d=64 94.6 / 232.8 ms with NO XLA baseline
    possible (its logits OOM). max |flash-xla| <= 9.8e-4 where both run.
    """
    if jax.default_backend() != "tpu":
        return False
    *_, sq, d = q.shape
    sk = k.shape[-2]
    if not (sq >= 1024 and sk >= 1024 and d % 64 == 0):
        # Below these sizes the XLA path is already speed-of-light; the
        # kernel's block bookkeeping would only add overhead.
        return False
    # The kernel tiles sequences by (block_q=256, block_k=512); shapes
    # that don't divide stay on XLA (the shipped video grids all divide).
    return sq % 256 == 0 and sk % 512 == 0


@functools.lru_cache(maxsize=1)
def _short_attn_min_rows() -> int:
    """Dispatch threshold (total q-rows = B*H*Sq) above which the fused
    BSC Pallas kernel takes over from the XLA einsum path. Env-tunable
    for A/B sweeps (XDIFFUSION_SHORT_ATTN_MIN_ROWS)."""
    import os

    return int(os.environ.get("XDIFFUSION_SHORT_ATTN_MIN_ROWS", "100000"))


def attention_bshd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    is_causal: bool = False,
) -> jax.Array:
    """Attention over (B, S, H, D) tensors WITHOUT transposing to (B, H, S, D).

    The head-major transpose that `to_heads` layouts force is a physical
    relayout copy on TPU (profiled at ~150us per copy at batch 512 on the
    DDPM bench); einsum contractions with the head axis as a batch
    dimension let XLA fold the logical transpose into the batched matmul's
    layout assignment instead. Returns (B, Sq, H, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if is_causal:
        sq, sk = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def attention_qkv(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    is_causal: bool = False,
) -> jax.Array:
    """Multi-head attention on (B, S, C=heads*head_dim) projections.

    On TPU, short non-causal sequences route through the fused Pallas
    kernel (ops/flash_attention.short_attention_bsc) that consumes the
    qkv-projection layout directly — no head transpose, no HBM logits.
    Everything else falls back to the head-batched einsum path."""
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    scale = d**-0.5
    import os

    mesh = _seq_parallel_mesh(b, sq, sk, is_causal)
    if mesh is not None:
        from xdiffusion_tpu.ops.ring_attention import (
            sequence_parallel_attention,
        )

        qh = q.reshape(b, sq, heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
        out = sequence_parallel_attention(
            qh, kh, vh, mesh, axis_name=_SEQ_CTX["axis"], scale=scale
        )
        return out.transpose(0, 2, 1, 3).reshape(b, sq, c)
    if (
        not is_causal
        and jax.default_backend() == "tpu"
        and os.environ.get("XDIFFUSION_SHORT_ATTN", "1") == "1"
        and c % heads == 0
        and max(sq, sk) <= 1024
        and sq % 8 == 0
        and sk % 8 == 0
        and d % 8 == 0
        # Below this the XLA path's logits traffic fits cache-side and the
        # kernel's per-call overhead loses (A/B on the DDIM bench: kernel
        # wins 7-10% at batch>=128 with 4 heads x seq 256, ties/loses at 64).
        # Re-verified round 4 on chip after the FastGroupNorm layout changes:
        # forcing the kernel at batch 64 (32,768 q-rows) measures 255.4 vs
        # 282.9 samples/s on the headline DDIM bench — the ~8 ms/run of
        # relayout copies the XLA path pays there is still cheaper than the
        # kernel's launch+slab overhead, so the 100k default stands.
        and b * heads * sq >= _short_attn_min_rows()
        # Per-grid-step VMEM block is (2*sq + 2*sk) * c * itemsize (q, out,
        # k, v slabs); wide-channel sites must not exceed the ~16 MB VMEM
        # budget or pallas compilation fails at runtime instead of falling
        # back. 8 MB leaves headroom for accumulators/double-buffering.
        and (2 * sq + 2 * sk) * c * q.dtype.itemsize <= 8 * 1024 * 1024
    ):
        from xdiffusion_tpu.ops.flash_attention import short_attention_bsc

        return short_attention_bsc(q, k, v, heads, scale)
    qh = q.reshape(b, sq, heads, d)
    kh = k.reshape(b, sk, heads, d)
    vh = v.reshape(b, sk, heads, d)
    return attention_bshd(qh, kh, vh, scale=scale, is_causal=is_causal).reshape(
        b, sq, c
    )


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
    mesh = _seq_parallel_mesh(q.shape[0], q.shape[-2], k.shape[-2], is_causal)
    if mesh is not None and not force_xla:
        from xdiffusion_tpu.ops.ring_attention import (
            sequence_parallel_attention,
        )

        return sequence_parallel_attention(
            q, k, v, mesh, axis_name=_SEQ_CTX["axis"], scale=scale
        )
    if not force_xla and _flash_eligible(q, k) and not is_causal:
        from xdiffusion_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale=scale, is_causal=is_causal)
