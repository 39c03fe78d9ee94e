"""Blocked flash attention (online softmax) as a Pallas TPU kernel.

The hot attention path for long-sequence score networks (video
transformers, DiT at high resolution). Design follows the TPU kernel
playbook: q blocks stream through the grid, k/v tiles are looped inside
the kernel with a running (max, sum, accumulator) online softmax so the
(Sq, Sk) logits matrix never materializes in HBM; logits/accumulation in
fp32 on the MXU (preferred_element_type), inputs may be bf16.

Backward: jax.custom_vjp recomputes attention with the fused XLA path —
numerically identical gradients, no extra residual memory. (A Pallas
backward kernel is a later optimization; training shapes in this repo are
small enough that XLA's fused backward is at parity.)

Grid: (batch, heads, Sq/block_q); kv loop: lax.fori_loop over Sk/block_k.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    # q_ref: (1, 1, block_q, D); k_ref/v_ref: (1, 1, Sk, D) resident in VMEM.
    q = q_ref[0, 0].astype(jnp.float32) * scale
    sk = k_ref.shape[2]
    block_q, d = q.shape
    num_kv = sk // block_k

    m0 = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        logits = jax.lax.dot_general(
            q,
            k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p,
            v.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """q: (B, H, Sq, D); k/v: (B, H, Sk, D). Returns (B, H, Sq, D)."""
    return _flash_forward(q, k, v, scale)


def _flash_forward(q, k, v, scale: float):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(DEFAULT_BLOCK_Q, sq)
    block_k = min(DEFAULT_BLOCK_K, sk)
    assert sq % block_q == 0 and sk % block_k == 0, (
        f"sequence ({sq},{sk}) must tile by ({block_q},{block_k})"
    )

    grid = (b, h, sq // block_q)
    kernel = functools.partial(_flash_kernel, scale=scale, block_k=block_k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, sk, d),
                lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, sk, d),
                lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(q, k, v)


def _flash_fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, residuals, g):
    # Recompute attention with the fused XLA path and differentiate that —
    # same math, so gradients match the kernel's forward.
    q, k, v = residuals

    def ref(q, k, v):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
