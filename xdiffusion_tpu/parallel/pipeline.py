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


def run_pipelined_stack(
    tmpl_apply: Callable[[Any, Any, Any, Optional[jax.Array]], Any],
    block_params: list,
    x: Any,
    cond: Any,
    pipe,
    rng: Optional[jax.Array] = None,
) -> Any:
    """Shared plumbing for score networks' pipelined block stacks.

    tmpl_apply(params_one_block, x, cond, rng_or_None) -> x applies ONE
    detached block template (module.clone(parent=None) + .apply). Used by
    DiT/PixArt/SD3/Flux: each network supplies only its template-apply
    lambda and the per-block param list; stacking, staging, microbatching
    and dropout-rng threading live here (gpipe_blocks).
    """
    mesh, axis, n_mb = pipe
    stacked = stack_block_params(block_params)
    if rng is None:
        def block_fn(p, a, cc):
            return tmpl_apply(p, a, cc, None)
    else:
        def block_fn(p, a, cc, r):
            return tmpl_apply(p, a, cc, r)
    return gpipe_blocks(
        block_fn, stacked, x, cond, mesh, axis=axis,
        num_microbatches=n_mb, rng=rng,
    )


def stackable(block_params: list) -> bool:
    """True when every block's param pytree has identical structure and
    leaf shapes — the precondition for stack_block_params. Networks with
    heterogeneous stacks (e.g. SD3.5's mixed MMDiT-X blocks) fall back to
    the sequential loop when this is False."""
    import numpy as np

    if not block_params:
        return False
    ref = jax.tree_util.tree_structure(block_params[0])
    ref_shapes = [
        np.shape(leaf) for leaf in jax.tree_util.tree_leaves(block_params[0])
    ]
    for p in block_params[1:]:
        if jax.tree_util.tree_structure(p) != ref:
            return False
        if [np.shape(l) for l in jax.tree_util.tree_leaves(p)] != ref_shapes:
            return False
    return True


def gpipe_blocks(
    block_fn: Callable[..., Any],
    stacked_params: Any,
    x: Any,
    c: Any,
    mesh: Mesh,
    *,
    axis: str = "pipeline",
    data_axis: str = "data",
    num_microbatches: Optional[int] = None,
    rng: Optional[jax.Array] = None,
) -> Any:
    """Run a homogeneous block stack as a GPipe pipeline over `axis`.

    block_fn(params_one_block, x_mb, c_mb) -> y_mb — or, when `rng` is
    given, block_fn(params_one_block, x_mb, c_mb, rng_block) — must be
    shape-preserving on x_mb (residual transformer blocks). Both `x`
    (the circulated activations) and `c` (per-example conditioning read
    by every stage) may be arbitrary pytrees of batch-leading arrays —
    e.g. SD3's (tokens, context) dual stream circulates as a tuple.
    stacked_params has leading axis D (total blocks); D must divide
    evenly into S = mesh.shape[axis] stages of k = D // S blocks. All
    activation/conditioning leaves are sharded over `data_axis` if
    present in the mesh, replicated over `axis`. The per-replica local
    batch must divide num_microbatches (default: S).

    `rng` threads dropout through the pipeline: each (microbatch, block)
    application receives fold_in(fold_in(rng, microbatch_index),
    global_block_index), so dropout masks are deterministic functions of
    (rng, position) and independent of the pipeline schedule — training
    under PP keeps dropout semantics instead of silently disabling it.
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
    x_leaves = jax.tree_util.tree_leaves(x)
    B = x_leaves[0].shape[0]
    if (B // n_data) % M:
        raise ValueError(
            f"local batch {B}/{n_data} not divisible by {M} microbatches"
        )

    def _to_mbs(tree, bl):
        return jax.tree_util.tree_map(
            lambda a: a.reshape((M, bl // M) + a.shape[1:]), tree
        )

    def _index(tree, i):
        return jax.tree_util.tree_map(
            lambda a: lax.dynamic_index_in_dim(a, i, keepdims=False), tree
        )

    def local(p_staged, x_local, c_local, rng_local):
        # p_staged: (1, k, ...) — this device's stage.
        p_stage = jax.tree_util.tree_map(lambda a: a[0], p_staged)
        s = lax.axis_index(axis)
        bl = jax.tree_util.tree_leaves(x_local)[0].shape[0]
        x_mbs = _to_mbs(x_local, bl)
        c_mbs = _to_mbs(c_local, bl)
        block_ids = jnp.arange(k) + s * k  # global block indices

        def stage_apply(act, cc, mb_idx):
            if rng_local is None:
                def body(a, p_block):
                    return block_fn(p_block, a, cc), None

                act, _ = lax.scan(body, act, p_stage)
            else:
                rng_mb = jax.random.fold_in(rng_local, mb_idx)

                def body(a, pb):
                    p_block, bid = pb
                    return (
                        block_fn(
                            p_block, a, cc, jax.random.fold_in(rng_mb, bid)
                        ),
                        None,
                    )

                act, _ = lax.scan(body, act, (p_stage, block_ids))
            return act

        out_sds = jax.eval_shape(
            stage_apply, _index(x_mbs, 0), _index(c_mbs, 0), 0
        )
        outs0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros((M,) + sd.shape, sd.dtype), out_sds
        )
        buf0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), out_sds
        )
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            buf, outs = carry
            # Stage 0 feeds microbatch t (clamped during drain, result
            # unused); later stages consume the circulated activation.
            feed = _index(x_mbs, jnp.clip(t, 0, M - 1))
            act = jax.tree_util.tree_map(
                lambda f, b: jnp.where(s == 0, f.astype(b.dtype), b),
                feed,
                buf,
            )
            # Stage s at tick t holds microbatch t - s (clamped while the
            # pipeline fills/drains; those ticks' outputs are discarded).
            mb_idx = jnp.clip(t - s, 0, M - 1)
            cc = _index(c_mbs, mb_idx)
            y = stage_apply(act, cc, mb_idx)
            # Last stage commits microbatch t-(S-1) once it's real.
            out_t = t - (S - 1)
            idx = jnp.clip(out_t, 0, M - 1)
            valid = (s == S - 1) & (out_t >= 0)
            outs = jax.tree_util.tree_map(
                lambda o, yy: lax.dynamic_update_index_in_dim(
                    o,
                    jnp.where(
                        valid,
                        yy,
                        lax.dynamic_index_in_dim(o, idx, keepdims=False),
                    ),
                    idx,
                    axis=0,
                ),
                outs,
                y,
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
        outs = jax.tree_util.tree_map(
            lambda o: lax.psum(jnp.where(s == S - 1, o, 0), axis), outs
        )
        return jax.tree_util.tree_map(
            lambda o: o.reshape((bl,) + o.shape[2:]), outs
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), batch_spec, batch_spec, P()),
        out_specs=batch_spec,
        check_vma=False,
    )
    return fn(staged, x, c, rng)
