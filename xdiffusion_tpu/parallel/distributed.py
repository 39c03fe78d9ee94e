"""Multi-host (multi-process) wiring for TPU slices.

The reference's distribution layer is single-node Accelerate-DDP
(reference training/image/train.py:108-128, torchrun in
tools/terraform/lambda_labs_train.sh:172). The TPU-native equivalent
(SURVEY §2.14) is:

- `jax.distributed.initialize()` once per process before any backend use
  (auto-detected on TPU pods; explicit coordinator env vars elsewhere);
- per-host data loading: each process loads only its shard of the global
  batch and `jax.make_array_from_process_local_data` assembles the
  logically-global array over the mesh — no host gathers cross DCN;
- orbax checkpointing already coordinates across processes when every
  process calls save/restore with the same path.

All entry points are no-ops in single-process runs, so the trainers call
them unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Triggers when explicit arguments are given, or when the standard env
    vars are present (JAX_COORDINATOR_ADDRESS / cloud-TPU pod metadata).
    Safe to call multiple times and in single-process runs (returns
    False without initializing).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    # Pod auto-detect: only when the worker list names MORE than one host
    # (single-host TPU VMs also export TPU_WORKER_HOSTNAMES).
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod = len([w for w in workers.split(",") if w.strip()]) > 1 or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not on_pod:
        return False
    kwargs = {}
    if explicit:
        kwargs["coordinator_address"] = explicit
        if num_processes is None:
            num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
        if process_id is None:
            pid = os.environ.get("JAX_PROCESS_ID")
            process_id = int(pid) if pid is not None else None
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """Per-host slice of the global batch (each host's loader produces
    only this many examples)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} must divide across {n} hosts"
    )
    return global_batch_size // n


def global_batch_from_local(batch, mesh: Mesh):
    """Assemble per-host local arrays into logically-global arrays sharded
    over the mesh's 'data' axis.

    Single-process: a plain device_put onto the data sharding (identical
    semantics, no cross-host addressing needed). Multi-process: the
    per-host shard never leaves its host — XLA addresses it in place.
    """
    sharding = NamedSharding(mesh, P("data"))

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(place, batch)
