"""Checkpointing via orbax (async-capable, multi-host aware).

Replaces the reference's torch.save dict checkpoints
(reference training/image/train.py:582-604: {step, model_state_dict,
optimizer_state_dicts, config}) with orbax-managed pytree checkpoints —
the idiomatic TPU equivalent including atomic renames, retention, and
resume (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(
    directory: str, state: Any, step: int, max_to_keep: int = 3
) -> None:
    """Save a TrainState pytree at `step`. Blocks until durable."""
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def _resolve_dir(directory: str) -> str:
    """Accept either the orbax step directory itself or a training run
    directory that contains a `checkpoints/` subdir (the layout the train
    CLIs write: output/<dataset>/<config>/checkpoints/<step>)."""
    sub = os.path.join(directory, "checkpoints")
    if os.path.isdir(directory):
        has_steps = any(
            name.isdigit() and os.path.isdir(os.path.join(directory, name))
            for name in os.listdir(directory)
        )
        if not has_steps and os.path.isdir(sub):
            return sub
    return directory


def latest_step(directory: str) -> Optional[int]:
    directory = _resolve_dir(directory)
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(
    directory: str,
    abstract_state: Any,
    step: Optional[int] = None,
    shardings: Any = None,
) -> Tuple[Any, int]:
    """Restore into the structure of `abstract_state` (a matching pytree,
    e.g. a freshly-initialized TrainState). Returns (state, step).

    `shardings` (optional, pytree of NamedSharding matching the state —
    parallel/placement.py state_shardings) restores each array DIRECTLY
    into its shard layout: on an fsdp/tensor mesh every device reads only
    its own shard from the checkpoint, instead of materializing the full
    array and re-slicing."""
    directory = _resolve_dir(directory)
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    assert step is not None, f"no checkpoint found in {directory}"
    if shardings is not None:
        target = jax.tree_util.tree_map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            abstract_state,
            shardings,
        )
    else:
        target = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_state
        )
    state = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return state, int(step)


# Parameter paths that are EXPECTED to be absent when warm-starting a video
# UNet from an image-UNet checkpoint (identity/zero-initialized temporal
# extensions; reference ddpm.py:810-814 load_checkpoint partial-load
# contract).
_TEMPORAL_KEY_MARKERS = (
    "tconv", "temporal", "motion", "attn_t", "time_mix", "adapter",
)


def restore_params_partial(
    directory: str,
    params: Any,
    step: Optional[int] = None,
    require_temporal_only: bool = True,
) -> Tuple[Any, int, list]:
    """Warm-start: fill `params` with every matching leaf of a checkpointed
    TrainState's params; leaves absent from the checkpoint (or with a
    different shape) keep their fresh initialization.

    This is the image->video transfer path (AnimateDiff / Video-LDM /
    pseudo-3D): the 2D backbone restores, the identity-initialized temporal
    modules stay at init. Returns (params, step, missing_paths).
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    assert step is not None, f"no checkpoint found in {directory}"
    raw = mgr.restore(step)  # structure-free restore: nested dicts
    mgr.close()
    # The checkpoint holds a TrainState-shaped dict; find its params tree.
    ckpt_params = raw.get("params", raw) if isinstance(raw, dict) else raw

    flat_new = flatten_dict(params)
    flat_old = flatten_dict(ckpt_params)
    merged = {}
    missing = []
    for path, leaf in flat_new.items():
        old = flat_old.get(path)
        if old is not None and tuple(old.shape) == tuple(leaf.shape):
            merged[path] = jax.numpy.asarray(old, dtype=leaf.dtype)
        else:
            merged[path] = leaf
            missing.append("/".join(str(p) for p in path))
    if require_temporal_only:
        unexpected = [
            m for m in missing
            if not any(marker in m.lower() for marker in _TEMPORAL_KEY_MARKERS)
        ]
        assert not unexpected, (
            "partial restore: missing keys are not all temporal/motion "
            f"modules: {unexpected[:10]}"
        )
    return unflatten_dict(merged), int(step), missing
