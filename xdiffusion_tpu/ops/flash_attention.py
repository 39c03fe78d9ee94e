"""Blocked flash attention (online softmax) as a Pallas TPU kernel.

The hot attention path for long-sequence score networks (video
transformers, DiT at high resolution). Design follows the TPU kernel
playbook: q blocks stream through the grid, k/v tiles are looped inside
the kernel with a running (max, sum, accumulator) online softmax so the
(Sq, Sk) logits matrix never materializes in HBM; logits/accumulation in
fp32 on the MXU (preferred_element_type), inputs may be bf16.

Backward: full Pallas, flash-style. The forward additionally emits the
per-row logsumexp (a tiny (B, H, Sq) fp32 tensor); the backward is two
kernels — dq streams q blocks and loops k/v tiles, dk/dv streams k/v
blocks and loops q tiles — each recomputing probabilities exactly as
p = exp(logits - lse), with the softmax-backward rowsum folded through
delta = rowsum(g * o) so no (Sq, Sk) matrix ever touches HBM in either
direction.

Grid: (batch, heads, S/block); inner tiles: lax.fori_loop.
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


def _dim_semantics(params: dict, semantics: tuple):
    """Attach Mosaic dimension_semantics when this JAX exposes it (the
    innermost grid axes below are accumulation ('arbitrary') axes; the
    rest are parallel). Harmless to omit — TPU grids execute as
    sequential loops with the last axis innermost either way."""
    try:
        return pltpu.CompilerParams(
            dimension_semantics=semantics, **params
        )
    except TypeError:
        return pltpu.CompilerParams(**params)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_s, l_s, acc_s, *, scale: float
):
    """One (q block, k/v tile) grid step of the online softmax.

    The k/v axis is the INNERMOST GRID DIMENSION, not an in-kernel loop
    over a VMEM-resident (1, 1, Sk, D) slab: the running (max, sum,
    accumulator) state lives in VMEM scratch that persists across the ki
    steps, and the o/lse blocks (whose index map ignores ki) are written
    on the final tile. Per-step VMEM is a few hundred KB regardless of
    sequence length — this is what lifted the round-4 kernel's 4096-token
    ceiling (its full-Sk slabs crashed the Mosaic compile helper at 8k).
    """
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (block_q, block_k); bf16 dot, fp32 accumulation
    m_prev = m_s[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_s[:] = acc_s[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_s[:] = m_new

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0, 0] = (acc_s[:] / l_s[:]).astype(o_ref.dtype)
        # Per-row logsumexp: the backward's softmax residual. Kept as a
        # (Sq, 1) trailing-unit column: Mosaic requires the last two
        # block dims be (8, 128)-divisible OR equal the array dims, so a
        # rank-3 (1, 1, block_q) row block fails to lower on real TPU.
        lse_ref[0, 0] = m_s[:] + jnp.log(l_s[:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """q: (B, H, Sq, D); k/v: (B, H, Sk, D). Returns (B, H, Sq, D)."""
    return _flash_forward(q, k, v, scale)[0]


def _flash_forward(q, k, v, scale: float):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(DEFAULT_BLOCK_Q, sq)
    block_k = min(DEFAULT_BLOCK_K, sk)
    assert sq % block_q == 0 and sk % block_k == 0, (
        f"sequence ({sq},{sk}) must tile by ({block_q},{block_k})"
    )

    grid = (b, h, sq // block_q, sk // block_k)
    kernel = functools.partial(_flash_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_q, 1),
                lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),   # output accumulator
        ],
        compiler_params=_dim_semantics(
            {}, ("parallel", "parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(q, k, v)


def _short_seq_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, group: int):
    """Fused attention for short sequences: G (batch*head) slices per grid
    step, full (Sq, Sk) logits + softmax held in VMEM/registers — the fp32
    logits tensor never round-trips HBM (the XLA path materializes it at
    large batch, which is what makes per-sample cost grow with batch on the
    DDIM bench). Unrolled loop over the G heads keeps every dot a static
    MXU shape."""
    for g in range(group):
        logits = jax.lax.dot_general(
            q_ref[g],
            k_ref[g],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (Sq, Sk); bf16 dot with fp32 accumulation on the MXU
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        w = (p / l).astype(v_ref.dtype)
        o_ref[g] = jax.lax.dot_general(
            w,
            v_ref[g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _short_group(n: int, sq: int, sk: int) -> int:
    """Heads per grid step: enough work to amortize grid-step overhead,
    bounded so blocks stay well under VMEM."""
    target = max(1, 4096 // max(sq, sk))
    g = 1
    while g * 2 <= target and n % (g * 2) == 0:
        g *= 2
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def short_attention(q, k, v, scale: float):
    """Fused non-causal attention for short sequences.

    q: (B, H, Sq, D); k/v: (B, H, Sk, D). Returns (B, H, Sq, D)."""
    return _short_forward(q, k, v, scale)


def _short_forward(q, k, v, scale: float):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    n = b * h
    group = _short_group(n, sq, sk)
    qf = q.reshape(n, sq, d)
    kf = k.reshape(n, sk, d)
    vf = v.reshape(n, sk, d)
    kernel = functools.partial(_short_seq_kernel, scale=scale, group=group)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=(n // group,),
        in_specs=[
            pl.BlockSpec((group, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, sk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, sk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (group, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * sq * sk * d,
            bytes_accessed=(2 * q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=n * sq * sk,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d)


def _short_fwd(q, k, v, scale):
    return _short_forward(q, k, v, scale), (q, k, v)


def _short_bwd(scale, residuals, g):
    q, k, v = residuals

    def ref(q, k, v):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


short_attention.defvjp(_short_fwd, _short_bwd)


def _bsc_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int,
                group: int):
    """Fused multi-head attention straight off the (B, S, C=H*D) qkv-
    projection layout: heads are static lane slices, so no head-major
    transpose (a physical relayout copy on TPU) ever materializes, and
    the fp32 (S, S) logits live only in VMEM/registers. Profiling the
    DDPM UNet at batch 512 showed the XLA path writing+reading each
    134 MB fp32 logits tensor through HBM plus 24 relayout copies —
    ~16 ms of a 56 ms forward."""
    c = q_ref.shape[-1]
    d = c // heads
    for g in range(group):
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            # bf16 x bf16 -> fp32 accumulation straight on the MXU (an
            # fp32 upcast before the dot would both add VPU converts and
            # drop the MXU to fp32 rate); scale applied to fp32 logits.
            logits = jax.lax.dot_general(
                q_ref[g, :, sl], k_ref[g, :, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (Sq, Sk)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            w = (p / l).astype(v_ref.dtype)
            o_ref[g, :, sl] = jax.lax.dot_general(
                w, v_ref[g, :, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def short_attention_bsc(q, k, v, heads: int, scale: float):
    """Fused non-causal attention in qkv-projection layout.

    q: (B, Sq, C); k/v: (B, Sk, C) with C = heads * head_dim. Returns
    (B, Sq, C). Heads never transpose to a head-major layout."""
    return _bsc_forward(q, k, v, heads, scale)


def _bsc_group_bytes() -> int:
    """Per-grid-step block budget for the (B,S,C) kernels. Larger groups
    amortize grid-step overhead (the lever for small-batch dispatch);
    env-tunable for A/B sweeps."""
    import os

    return int(
        os.environ.get("XDIFFUSION_BSC_GROUP_BYTES", 4 * 2**20)
    )


def _bsc_forward(q, k, v, heads, scale):
    b, sq, c = q.shape
    sk = k.shape[1]
    # ~4 MB (default) of q/k/v/o block bytes per grid step: enough
    # per-step work to amortize grid overhead while staying inside VMEM.
    per = (2 * sq + 2 * sk) * c * q.dtype.itemsize
    budget = _bsc_group_bytes()
    group = 1
    while group * 2 <= b and b % (group * 2) == 0 and (group * 2) * per <= budget:
        group *= 2
    kernel = functools.partial(_bsc_kernel, scale=scale, heads=heads, group=group)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, sq, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, sk, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, sk, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (group, sq, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq * sk * c,
            bytes_accessed=(2 * q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=b * heads * sq * sk,
        ),
    )(q, k, v)


def _bsc_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                    scale: float, heads: int, group: int):
    """Whole-matrix attention backward in VMEM: recompute the (Sq, Sk)
    softmax, then dv = p^T g, ds = p * (g k-dot - rowsum), dq = ds k,
    dk = ds^T q — the fp32 logits/probabilities never touch HBM (the
    XLA-recompute backward materialized them, so training still paid the
    HBM traffic the forward kernel had eliminated)."""
    c = q_ref.shape[-1]
    d = c // heads
    for gi in range(group):
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            q = q_ref[gi, :, sl]
            k = k_ref[gi, :, sl]
            v = v_ref[gi, :, sl]
            g = g_ref[gi, :, sl]
            logits = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (Sq, Sk)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            p = (e / l).astype(v.dtype)  # matches forward's bf16 rounding
            # dv = p^T @ g
            dv_ref[gi, :, sl] = jax.lax.dot_general(
                p, g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
            # dp = g @ v^T ; softmax backward: ds = p * (dp - sum(dp*p))
            dp = jax.lax.dot_general(
                g, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Sq, Sk)
            pf = p.astype(jnp.float32)
            ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
            ds = (ds * scale).astype(q.dtype)
            dq_ref[gi, :, sl] = jax.lax.dot_general(
                ds, k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype)
            dk_ref[gi, :, sl] = jax.lax.dot_general(
                ds, q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)


def _bsc_backward(q, k, v, g, heads, scale):
    b, sq, c = q.shape
    sk = k.shape[1]
    per = (2 * sq + 3 * sk) * c * q.dtype.itemsize
    budget = _bsc_group_bytes()
    group = 1
    while group * 2 <= b and b % (group * 2) == 0 and (group * 2) * per <= budget:
        group *= 2
    kernel = functools.partial(
        _bsc_bwd_kernel, scale=scale, heads=heads, group=group
    )
    spec_q = pl.BlockSpec((group, sq, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((group, sk, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b // group,),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * sq * sk * c,
            bytes_accessed=(4 * q.size + 3 * k.size) * q.dtype.itemsize,
            transcendentals=b * heads * sq * sk,
        ),
    )(q, k, v, g)


def _bsc_fwd(q, k, v, heads, scale):
    return _bsc_forward(q, k, v, heads, scale), (q, k, v)


def _bsc_bwd(heads, scale, residuals, g):
    q, k, v = residuals
    return _bsc_backward(q, k, v, g, heads, scale)


short_attention_bsc.defvjp(_bsc_fwd, _bsc_bwd)


def _flash_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, dq_s, *,
    scale: float,
):
    """dq for one (q block, k/v tile) grid step: p = exp(logits - lse),
    ds = p * (g v^T - delta) * scale, dq_scratch += ds @ k; the dq block
    is committed on the final k/v tile. Like the forward, the k/v axis is
    the innermost grid dimension — no full-Sk VMEM slab."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        dq_s[:] = jnp.zeros_like(dq_s)

    q = q_ref[0, 0]
    g = g_ref[0, 0]
    lse = lse_ref[0, 0]  # (block_q, 1) fp32
    delta = delta_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(logits - lse)  # (block_q, block_k) fp32
    dp = jax.lax.dot_general(
        g, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq_s[:] = dq_s[:] + jax.lax.dot_general(
        ds, k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0, 0] = dq_s[:].astype(dq_ref.dtype)


def _flash_dkv_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_s, dv_s, *, scale: float,
):
    """dk/dv for one (k/v block, q tile) grid step: accumulate
    dv_scratch += p^T g and dk_scratch += ds^T q across the q tiles
    (innermost grid dimension); commit on the final tile."""
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    k = k_ref[0, 0]
    v = v_ref[0, 0]
    q = q_ref[0, 0]
    g = g_ref[0, 0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (block_q, block_k)
    p = jnp.exp(logits - lse)
    dv_s[:] = dv_s[:] + jax.lax.dot_general(
        p.astype(g.dtype), g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        g, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dk_s[:] = dk_s[:] + jax.lax.dot_general(
        ds, q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0, 0] = dk_s[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_s[:].astype(dv_ref.dtype)


def _flash_fwd(q, k, v, scale):
    o, lse = _flash_forward(q, k, v, scale)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, residuals, g):
    q, k, v, o, lse = residuals
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(DEFAULT_BLOCK_Q, sq)
    block_k = min(DEFAULT_BLOCK_K, sk)
    # Softmax-backward rowsum folded through the output:
    # sum_k dp*p == rowsum(g * o).
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32),
        axis=-1,
        keepdims=True,
    )  # (B, H, Sq, 1) — trailing-unit column like lse (Mosaic tiling)

    # (q-major grid) blocks: q/g/dq/lse/delta advance with qi, k/v with ki.
    q_by_qi = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    k_by_ki = pl.BlockSpec(
        (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
        memory_space=pltpu.VMEM,
    )
    row_by_qi = pl.BlockSpec(
        (1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h, sq // block_q, sk // block_k),
        in_specs=[q_by_qi, k_by_ki, k_by_ki, q_by_qi, row_by_qi, row_by_qi],
        out_specs=q_by_qi,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=_dim_semantics(
            {}, ("parallel", "parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * sq * sk * d,
            bytes_accessed=3 * q.size * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(q, k, v, g, lse, delta)

    # (k-major grid) blocks: k/v/dk/dv advance with ki, q tiles innermost.
    q_by_qi2 = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    k_by_ki2 = pl.BlockSpec(
        (1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0),
        memory_space=pltpu.VMEM,
    )
    row_by_qi2 = pl.BlockSpec(
        (1, 1, block_q, 1), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b, h, sk // block_k, sq // block_q),
        in_specs=[
            q_by_qi2, k_by_ki2, k_by_ki2, q_by_qi2, row_by_qi2, row_by_qi2,
        ],
        out_specs=(k_by_ki2, k_by_ki2),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=_dim_semantics(
            {}, ("parallel", "parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * sq * sk * d,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd, _flash_bwd)
