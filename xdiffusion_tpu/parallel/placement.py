"""Mesh-driven TrainState placement: the trainer-facing parallelism wiring.

This closes the gap between the verified sharding rules (mesh.py) and the
user-facing trainers: instead of `accelerator.prepare()` (reference
training/image/train.py:215-226) deciding the distribution mode, the
`XDIFFUSION_MESH` env var names the mesh axes and this module derives the
placement of the ENTIRE TrainState from them:

- `fsdp` axis     -> ZeRO-3 parameter sharding (`fsdp_param_shardings`)
- `tensor` axis   -> Megatron column/row rules (`tensor_param_shardings`,
                     with fsdp fallback for unmatched params)
- `expert` axis   -> stacked-expert-kernel sharding (`expert_param_shardings`)
- `pipeline` axis -> handled by the GPipe engine (parallel/pipeline.py);
                     parameters stay replicated here and the stacked stage
                     slices shard inside the pipelined shard_map
- otherwise       -> replicated (pure DP)

Optimizer moments (adam mu/nu, MultiSteps grad accumulators) and EMA
shadows follow the parameter shardings — that is what makes fsdp actually
ZeRO-3 (optimizer state sharded too) rather than just ZeRO-3-for-params.
Scalars (step counters, importance-sampler histories) replicate.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh

from xdiffusion_tpu.parallel.mesh import (
    expert_param_shardings,
    fsdp_param_shardings,
    replicated,
    tensor_param_shardings,
)


def param_sharding_rules(params, mesh: Mesh):
    """Parameter-sharding pytree implied by the mesh's axis names."""
    if mesh.shape.get("tensor", 1) > 1:
        return tensor_param_shardings(params, mesh)
    if mesh.shape.get("expert", 1) > 1:
        return expert_param_shardings(params, mesh)
    if mesh.shape.get("fsdp", 1) > 1:
        return fsdp_param_shardings(params, mesh)
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, params)


def state_shardings(state: Any, mesh: Mesh, param_rules=None) -> Any:
    """A sharding pytree matching `state`'s structure.

    Any subtree whose structure equals the params pytree (or one of its
    top-level children — the VAE trainers keep {'ae':..,'disc':..} params
    with per-subtree optimizers) gets the parameter rules; every other
    leaf replicates. Works for TrainState and VAETrainState alike without
    either needing to know about sharding.
    """
    params = state.params
    if param_rules is None:
        param_rules = param_sharding_rules(params, mesh)
    rep = replicated(mesh)

    candidates = [(jax.tree_util.tree_structure(params), param_rules)]
    if isinstance(params, dict):
        for key, sub in params.items():
            if isinstance(sub, dict):
                candidates.append(
                    (jax.tree_util.tree_structure(sub), param_rules[key])
                )

    def match(node):
        if isinstance(node, jax.Array) or not isinstance(
            node, (dict, list, tuple)
        ):
            return None
        structure = jax.tree_util.tree_structure(node)
        for treedef, rules in candidates:
            if structure == treedef:
                return rules
        return None

    def is_params_like(node):
        return match(node) is not None

    return jax.tree_util.tree_map(
        lambda node: match(node) if is_params_like(node) else rep,
        state,
        is_leaf=is_params_like,
    )


def shard_train_state(state: Any, mesh: Mesh) -> Tuple[Any, Any]:
    """Place a TrainState onto the mesh per its axis names.

    Returns (placed_state, shardings). The shardings pytree feeds
    `make_train_step(state_shardings=...)` (output constraint — keeps the
    updated state sharded across steps without relying on GSPMD
    propagation alone) and `checkpoints.restore_checkpoint(shardings=...)`
    (restore each array directly into its shard layout).
    """
    shardings = state_shardings(state, mesh)
    return jax.device_put(state, shardings), shardings
