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


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(
    directory: str, abstract_state: Any, step: Optional[int] = None
) -> Tuple[Any, int]:
    """Restore into the structure of `abstract_state` (a matching pytree,
    e.g. a freshly-initialized TrainState). Returns (state, step)."""
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    assert step is not None, f"no checkpoint found in {directory}"
    target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, abstract_state)
    state = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return state, int(step)
