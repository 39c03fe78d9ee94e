"""GPipe-style pipeline parallelism over a 'pipeline' mesh axis.

The reference framework is single-GPU (its only distribution mode is DDP
via accelerate — reference training/image/train.py:60-66), so there is no
counterpart to translate: this is the TPU-native design. Stages live on
the 'pipeline' mesh axis; each device holds the stacked parameters of its
contiguous slice of transformer blocks, and microbatches circulate
through the stages with `lax.ppermute` inside a `shard_map` — the
classic collective-pipelining schedule (fill S-1 ticks, steady state,
drain), expressed as ONE `lax.scan` so the whole pipeline is a single
compiled XLA program with no host round-trips.

Design notes (TPU/XLA):
- Stage parameters are stacked along a leading axis sharded
  `P('pipeline')`; each device slices its own stage and scans its k
  blocks locally (`lax.scan` over the stacked block axis), so the block
  body compiles ONCE regardless of depth.
- Activations move stage-to-stage with `ppermute` over the 'pipeline'
  axis — point-to-point ICI neighbor traffic, no all-to-alls.
- The data axis composes orthogonally: the batch stays sharded over
  'data' and each pipeline replica microbatches its LOCAL batch, so
  DP x PP meshes work out of the box.
- The final `psum` masks every stage but the last and broadcasts the
  collected outputs back over the pipeline axis (activations-sized, once
  per call). A production serving deployment would leave the output on
  the last stage; the broadcast keeps the module contract (every device
  returns the full local-batch output) so the surrounding score-network
  code needs no changes.
- Differentiable end to end: `ppermute`/`psum`/`scan` all have
  transposes, so `jax.grad` through a pipelined forward yields the
  standard GPipe backward schedule (reverse circulation).

Consumed by `score_networks/dit.py`: inside `pipeline_parallel(mesh)`,
the DiT block stack routes through `gpipe_blocks` (mirrors the
`sequence_parallel` context pattern in ops/attention.py).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

_PIPE_CTX = {"mesh": None, "axis": "pipeline", "num_microbatches": None}


def set_pipeline_parallel_mesh(
    mesh: Optional[Mesh],
    axis_name: str = "pipeline",
    num_microbatches: Optional[int] = None,
) -> None:
    """Install (or clear, with mesh=None) the process-wide pipeline mesh."""
    _PIPE_CTX["mesh"] = mesh
    _PIPE_CTX["axis"] = axis_name
    _PIPE_CTX["num_microbatches"] = num_microbatches


@contextlib.contextmanager
def pipeline_parallel(
    mesh: Mesh,
    axis_name: str = "pipeline",
    num_microbatches: Optional[int] = None,
):
    """Route supporting score networks' block stacks through the pipeline
    engine while active. `num_microbatches` defaults to the pipeline axis
    size (bubble fraction (S-1)/(M+S-1))."""
    prev = dict(_PIPE_CTX)
    set_pipeline_parallel_mesh(mesh, axis_name, num_microbatches)
    try:
        yield
    finally:
        _PIPE_CTX.update(prev)


def get_pipeline_context():
    """(mesh, axis_name, num_microbatches) or None when inactive."""
    mesh = _PIPE_CTX["mesh"]
    if mesh is None or _PIPE_CTX["axis"] not in mesh.shape:
        return None
    return mesh, _PIPE_CTX["axis"], _PIPE_CTX["num_microbatches"]


def stack_block_params(block_params: list) -> Any:
    """Stack per-block parameter pytrees (identical structure) along a new
    leading 'block' axis — the layout the engine shards over 'pipeline'."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *block_params
    )


def gpipe_blocks(
    block_fn: Callable[[Any, jax.Array, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    c: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "pipeline",
    data_axis: str = "data",
    num_microbatches: Optional[int] = None,
) -> jax.Array:
    """Run a homogeneous block stack as a GPipe pipeline over `axis`.

    block_fn(params_one_block, x_mb, c_mb) -> y_mb, shape-preserving on
    x_mb (residual transformer blocks). stacked_params has leading axis
    D (total blocks); D must divide evenly into S = mesh.shape[axis]
    stages of k = D // S blocks. x is the (local-host view of the)
    global token batch (B, ...), c the per-example conditioning (B, ...);
    both sharded over `data_axis` if present in the mesh, replicated over
    `axis`. The per-replica local batch must divide num_microbatches
    (default: S).
    """
    shard_map = jax.shard_map

    S = mesh.shape[axis]
    D = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if D % S:
        raise ValueError(f"{D} blocks not divisible into {S} stages")
    k = D // S
    M = int(num_microbatches) if num_microbatches else S
    # (D, ...) -> (S, k, ...): leading stage axis sharded over 'pipeline'.
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((S, k) + a.shape[1:]), stacked_params
    )

    n_data = mesh.shape.get(data_axis, 1)
    batch_spec = P(data_axis) if data_axis in mesh.shape else P()
    if (x.shape[0] // n_data) % M:
        raise ValueError(
            f"local batch {x.shape[0]}/{n_data} not divisible by "
            f"{M} microbatches"
        )

    def local(p_staged, x_local, c_local):
        # p_staged: (1, k, ...) — this device's stage.
        p_stage = jax.tree_util.tree_map(lambda a: a[0], p_staged)
        s = lax.axis_index(axis)
        bl = x_local.shape[0]
        mb = bl // M
        x_mbs = x_local.reshape((M, mb) + x_local.shape[1:])
        c_mbs = c_local.reshape((M, mb) + c_local.shape[1:])

        def stage_apply(act, cc):
            def body(a, p_block):
                return block_fn(p_block, a, cc), None

            act, _ = lax.scan(body, act, p_stage)
            return act

        out_shape = jax.eval_shape(stage_apply, x_mbs[0], c_mbs[0])
        outs0 = jnp.zeros((M,) + out_shape.shape, out_shape.dtype)
        buf0 = jnp.zeros(out_shape.shape, out_shape.dtype)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            buf, outs = carry
            # Stage 0 feeds microbatch t (clamped during drain, result
            # unused); later stages consume the circulated activation.
            feed = lax.dynamic_index_in_dim(
                x_mbs, jnp.clip(t, 0, M - 1), keepdims=False
            ).astype(buf.dtype)
            act = jnp.where(s == 0, feed, buf)
            # Stage s at tick t holds microbatch t - s (clamped while the
            # pipeline fills/drains; those ticks' outputs are discarded).
            cc = lax.dynamic_index_in_dim(
                c_mbs, jnp.clip(t - s, 0, M - 1), keepdims=False
            )
            y = stage_apply(act, cc)
            # Last stage commits microbatch t-(S-1) once it's real.
            out_t = t - (S - 1)
            idx = jnp.clip(out_t, 0, M - 1)
            valid = (s == S - 1) & (out_t >= 0)
            cur = lax.dynamic_index_in_dim(outs, idx, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, cur), idx, axis=0
            )
            # Circulate activations one stage forward (ring; stage 0
            # ignores what wraps around from the last stage).
            buf = lax.ppermute(y, axis, perm)
            return (buf, outs), None

        (_, outs), _ = lax.scan(
            tick, (buf0, outs0), jnp.arange(M + S - 1)
        )
        # Broadcast the last stage's collected outputs to every stage so
        # the caller sees a replicated-over-pipeline result.
        outs = lax.psum(jnp.where(s == S - 1, outs, 0), axis)
        return outs.reshape((bl,) + outs.shape[2:])

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), batch_spec, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    return fn(staged, x, c)
