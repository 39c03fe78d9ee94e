"""Fused affine(+SiLU)+3x3-conv(+residual) Pallas kernel for resnet blocks.

The UNet residual-block interior is the framework's hottest byte path
(reference layers/resnet.py:9-200; our layers/resnet.py). Unfused, each
`GroupNorm -> SiLU -> Conv3x3` pair costs three HBM round-trips of the
activation: the stats reduce reads x, the normalize+SiLU pass reads x and
writes y, and the conv reads y back. Round-2 profiling showed the flagship
forward pinned at the HBM roofline, so the remaining lever is BYTES, not
scheduling (BASELINE.md "Batch-scaling root cause").

This kernel folds the normalize+affine+SiLU application INTO the conv's
input load (GroupNorm reduces to `x * a + off` with per-(batch, channel)
coefficients — see ops/norm.py), and optionally folds the block's closing
skip-add into the conv's epilogue:

    out = conv3x3_same(silu(x * a + off), w) + b [+ residual]

HBM traffic per `norm -> silu -> conv` site drops from 3 reads + 2 writes
to 2 reads + 1 write of the big activation (the stats pass still reads x
once); fusing the skip-add saves a further read + write of the output.

Layout: the (B, H, W, C) activation is viewed as (B, H*W, C) — channels on
lanes, flattened pixels on sublanes. The 3x3 taps become 9 static
`pltpu.roll`s of the flattened slab (shift dy*W + dx) with boundary masks
(rows that wrapped across the image edge contribute zero, which is exactly
'SAME' zero padding), each followed by a (HW, C) x (C, Co) MXU matmul into
an fp32 accumulator. Weights use a constant index map, so Pallas fetches
them once and keeps them VMEM-resident across the batch grid.

Gradients: `jax.custom_vjp` with the backward running the plain-XLA
reference implementation under `jax.vjp` (recompute-style, like
`jax.checkpoint`): correct for all operands, no hand-written transpose.

Dispatch: TPU backend, 128-aligned channels, slab fits the VMEM budget;
everything else (CPU tests, thin channels, huge maps) takes the XLA path,
which is bit-identical to the unfused module math.

MEASURED RESULT (v5e, round 3, tools/tpu_recovery_results.jsonl): despite
the bytes win on paper, the kernel is ~27% SLOWER than the unfused XLA
path at the headline config (204.98 vs 281.29 samples/s/chip, 50-step
DDIM batch 64) — the fp32 roll workaround and per-tap cast copies eat
the saved HBM traffic in VMEM bandwidth/issue slots. It stays gated OFF
by default (`XDIFFUSION_FUSED_RESBLOCK=1` to enable); do not enable it
expecting a speedup at these shapes — bench.py A/Bs it every run.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-grid-step VMEM budget (bytes). v5e has ~16 MB of VMEM per core; the
# kernel needs x + y + fp32 acc + weights + out (+ residual) resident.
_VMEM_BUDGET = 12 * 1024 * 1024


def _kernel(x_ref, a_ref, off_ref, w_ref, b_ref, *rest, h: int, w: int,
            c_out: int, apply_silu: bool, has_res: bool):
    if has_res:
        res_ref, o_ref = rest
    else:
        (o_ref,) = rest
    hw = h * w
    x = x_ref[0]  # (HW, C)
    a = a_ref[0].astype(jnp.float32)      # (1, C)
    off = off_ref[0].astype(jnp.float32)  # (1, C)
    y = x.astype(jnp.float32) * a + off
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    # Mosaic's sublane rotate only supports 32-bit data ("Rotate with
    # non-32-bit data"), so the taps are rolled in fp32 and cast to the
    # compute dtype after masking — the converts stay in VMEM/registers.

    idx = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    row = idx // w
    col = idx - row * w

    acc = jnp.broadcast_to(
        b_ref[...].astype(jnp.float32), (hw, c_out)
    )
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            # out[p] += y[p + s] * w_tap, zero where the tap falls off the
            # image ('SAME' padding); the flat roll wraps across row ends
            # and image edges, and the mask kills exactly those lanes.
            s = dy * w + dx
            # pltpu.roll wants a non-negative shift; the roll is circular,
            # so -s mod HW is the same rotation.
            shifted = pltpu.roll(y, (-s) % hw, 0) if s != 0 else y
            valid = (
                (row + dy >= 0) & (row + dy < h)
                & (col + dx >= 0) & (col + dx < w)
            )
            tap = jnp.where(valid, shifted, jnp.zeros_like(shifted))
            tap = tap.astype(x.dtype)
            k = (dy + 1) * 3 + (dx + 1)
            acc += jax.lax.dot(
                tap, w_ref[k], preferred_element_type=jnp.float32
            )
    if has_res:
        acc += res_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _pallas_call(x, a, off, kernel_w, bias, residual, apply_silu):
    b, h, w, c = x.shape
    c_out = kernel_w.shape[-1]
    hw = h * w
    x2 = x.reshape(b, hw, c)
    w9 = kernel_w.astype(x.dtype).reshape(9, c, c_out)
    has_res = residual is not None
    body = functools.partial(
        _kernel, h=h, w=w, c_out=c_out, apply_silu=apply_silu,
        has_res=has_res,
    )
    in_specs = [
        pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        # a/off are (B, 1, C) so the per-step block's trailing dims equal
        # the array's — TPU requires trailing block dims divisible by
        # (8, 128) OR equal to the array dims, and (1, C) blocks of a
        # (B, C) array violate the sublane rule.
        pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, c, c_out), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x2, a.astype(jnp.float32).reshape(b, 1, c),
                off.astype(jnp.float32).reshape(b, 1, c), w9,
                bias.astype(jnp.float32).reshape(1, c_out)]
    if has_res:
        in_specs.append(
            pl.BlockSpec((1, hw, c_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual.reshape(b, hw, c_out))
    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((b, hw, c_out), x.dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hw, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * hw * c * c_out,
            bytes_accessed=(x.size + 9 * c * c_out + (2 + has_res) * b * hw
                            * c_out) * x.dtype.itemsize,
            transcendentals=b * hw * c if apply_silu else 0,
        ),
    )(*operands)
    return out.reshape(b, h, w, c_out)


def _xla_impl(x, a, off, kernel_w, bias, residual, apply_silu):
    """Reference path: bit-identical to the unfused module composition
    (ops/norm._apply_affine + flax nn.Conv defaults)."""
    bsz = x.shape[0]
    c = x.shape[-1]
    y = (x * a.reshape(bsz, 1, 1, c).astype(x.dtype)
         + off.reshape(bsz, 1, 1, c).astype(x.dtype))
    if apply_silu:
        y = jax.nn.silu(y)
    out = jax.lax.conv_general_dilated(
        y, kernel_w.astype(x.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(x.dtype)
    if residual is not None:
        out = out + residual
    return out


def _eligible(x, c_out: int, residual) -> bool:
    if jax.default_backend() != "tpu":
        return False
    b, h, w, c = x.shape
    if c % 128 != 0 or c_out % 128 != 0 or (h * w) % 8 != 0:
        return False
    hw = h * w
    item = x.dtype.itemsize
    vmem = (
        hw * c * item          # x block
        + hw * c * 4           # y (kept fp32 for Mosaic's 32-bit rotate)
        + hw * c * 4           # per-tap rolled/masked fp32 slab (live temp)
        + hw * c * item        # per-tap compute-dtype cast copy (live temp)
        + hw * c_out * 4       # fp32 accumulator
        + 9 * c * c_out * item  # weights
        + hw * c_out * item    # out block
    )
    if residual is not None:
        vmem += hw * c_out * item
    return vmem <= _VMEM_BUDGET


def _make_op(has_res: bool):
    if has_res:
        def base(x, a, off, w, bias, res, apply_silu):
            if _eligible(x, w.shape[-1], res):
                return _pallas_call(x, a, off, w, bias, res, apply_silu)
            return _xla_impl(x, a, off, w, bias, res, apply_silu)
    else:
        def base(x, a, off, w, bias, apply_silu):
            if _eligible(x, w.shape[-1], None):
                return _pallas_call(x, a, off, w, bias, None, apply_silu)
            return _xla_impl(x, a, off, w, bias, None, apply_silu)

    op = jax.custom_vjp(base, nondiff_argnums=(6,) if has_res else (5,))

    if has_res:
        def fwd(x, a, off, w, bias, res, apply_silu):
            return base(x, a, off, w, bias, res, apply_silu), (
                x, a, off, w, bias
            )

        def bwd(apply_silu, saved, g):
            x, a, off, w, bias = saved
            _, vjp = jax.vjp(
                lambda *ops: _xla_impl(*ops, None, apply_silu),
                x, a, off, w, bias,
            )
            return vjp(g) + (g,)
    else:
        def fwd(x, a, off, w, bias, apply_silu):
            return base(x, a, off, w, bias, apply_silu), (
                x, a, off, w, bias
            )

        def bwd(apply_silu, saved, g):
            x, a, off, w, bias = saved
            _, vjp = jax.vjp(
                lambda *ops: _xla_impl(*ops, None, apply_silu),
                x, a, off, w, bias,
            )
            return vjp(g)

    op.defvjp(fwd, bwd)
    return op


_OP_RES = _make_op(True)
_OP_NORES = _make_op(False)


def affine_silu_conv3x3(
    x: jax.Array,
    a: jax.Array,
    off: jax.Array,
    kernel_w: jax.Array,
    bias: jax.Array,
    residual: Optional[jax.Array] = None,
    apply_silu: bool = True,
) -> jax.Array:
    """conv3x3_same(silu(x * a + off), kernel_w) + bias [+ residual].

    x: (B, H, W, C) NHWC activation; a/off: (B, C) fp32 per-(batch,
    channel) affine coefficients (from ops.norm.group_norm_coefficients,
    optionally with adaptive scale-shift folded in); kernel_w: (3, 3, C,
    Co) HWIO; bias: (Co,); residual: optional (B, H, W, Co) added to the
    conv output (the block's skip connection).
    """
    assert kernel_w.shape[:2] == (3, 3), "3x3 kernels only"
    bsz, c = x.shape[0], x.shape[-1]
    a = a.reshape(bsz, c)
    off = off.reshape(bsz, c)
    if residual is not None:
        return _OP_RES(x, a, off, kernel_w, bias, residual, apply_silu)
    return _OP_NORES(x, a, off, kernel_w, bias, apply_silu)
