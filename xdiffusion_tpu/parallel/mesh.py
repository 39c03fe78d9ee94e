"""Mesh construction and sharding rules."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "fsdp"),
    devices=None,
) -> Mesh:
    """A 2D ('data', 'fsdp') mesh over the available devices.

    Default layout puts every device on the data axis (pure DP) — the
    reference's only parallelism mode — but the fsdp axis is first-class:
    pass shape=(n_data, n_fsdp) to shard parameters too. On multi-host
    TPU slices the devices argument should come from jax.devices() after
    jax.distributed.initialize(); axis order keeps 'fsdp' innermost so its
    collectives ride the fastest ICI links.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (dict of numpy arrays) onto the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def fsdp_param_shardings(params, mesh: Mesh):
    """ZeRO-3 style parameter sharding rules.

    Each parameter is sharded along its largest dimension divisible by the
    fsdp axis size; parameters with no such dimension (or too small to be
    worth scattering) are replicated. XLA then inserts the all-gathers on
    use and reduce-scatters on the gradient, overlapping them with compute.
    """
    fsdp = mesh.shape["fsdp"]

    def rule(p):
        if fsdp == 1 or p.ndim == 0 or p.size < 2**16:
            return NamedSharding(mesh, P())
        dims = sorted(range(p.ndim), key=lambda d: -p.shape[d])
        for d in dims:
            if p.shape[d] % fsdp == 0:
                spec = [None] * p.ndim
                spec[d] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
