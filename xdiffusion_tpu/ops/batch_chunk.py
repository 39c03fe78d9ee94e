"""Batch-chunked forward: keep XLA on the channels-minor layout at
large batch.

Root cause (measured on v5e, tools/hlo_batch_diff.py): XLA's layout
assignment flips every large activation tensor of the conv backbone from
channels-minor `{3,0,2,1}` (channels on the 128-lane axis) to
batch-minor `{0,3,2,1}` (batch on lanes) once the batch dimension is
large enough to fill lanes (>=256). The batch-minor conv mapping is
~1.23x slower per sample at batch 512 despite LOWER cost-analysis
bytes/sample (44.8 MB vs 61.9 MB) — achieved bandwidth collapses from
~607 GB/s to ~357 GB/s. (The reference framework never hits this: torch
convs are NCHW cuDNN calls with no global layout assignment pass.)

Fix: evaluate the score network over `lax.map` chunks of <=128 samples
inside the jitted program. The mapped body compiles once with the
small-batch layouts; the stacked chunk buffers stay in HBM and are
sliced per iteration, so the only overhead is one dynamic-slice/
dynamic-update per chunk — negligible against the relayout win.

`chunk_batched_apply` is generic over the context dict: only leaves
whose leading axis equals the batch size are split; everything else
(scalar knobs, shared tables like per-frame timestep-embedding grids)
is closed over unchanged.

Multi-chip note: the chunk size is in GLOBAL batch elements. When the
batch axis is sharded over a 'data' mesh axis, set
XDIFFUSION_FORWARD_CHUNK to the PER-CHIP batch (or a multiple of the
data-axis size) so each lax.map iteration keeps whole shards — or 0 to
disable. The single-chip default (64) is tuned for the v5e layout
behavior documented above.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def forward_chunk_size() -> int:
    """Chunk size for large-batch forwards; 0 disables chunking.

    Default 64: measured optimum on v5e (tools/chunk_sweep.py) — at
    batch 256/512 the 64-sample chunk runs ~292 samples/s/chip vs 204
    unchunked at batch 512 (+43%) and vs ~255 with 128-sample chunks;
    it also slightly beats the direct batch-64 program (~280) because
    the lax.map loop amortizes per-step dispatch. See BASELINE.md
    batch-scaling section.
    """
    return int(os.environ.get("XDIFFUSION_FORWARD_CHUNK", "64"))


def chunk_batched_apply(
    apply_fn: Callable[[jax.Array, Dict[str, Any]], jax.Array],
    x: jax.Array,
    context: Dict[str, Any],
    chunk: int | None = None,
) -> jax.Array:
    """Apply `apply_fn(x_chunk, context_chunk)` over batch chunks.

    No-op (single direct call) when chunking is disabled, the batch is
    already <= chunk, or the batch doesn't divide evenly (jit shapes are
    static, so the divisibility check happens at trace time).
    """
    chunk = forward_chunk_size() if chunk is None else chunk
    b = x.shape[0]
    if chunk <= 0 or b <= chunk or b % chunk != 0:
        return apply_fn(x, context)

    n = b // chunk
    moving = {
        k: v
        for k, v in context.items()
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == b
    }
    static = {k: v for k, v in context.items() if k not in moving}

    xr = x.reshape((n, chunk) + x.shape[1:])
    mr = {
        k: jnp.reshape(v, (n, chunk) + v.shape[1:]) for k, v in moving.items()
    }

    def body(args):
        xc, mc = args
        return apply_fn(xc, {**static, **mc})

    out = jax.lax.map(body, (xr, mr))
    return out.reshape((b,) + out.shape[2:])
