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
        import os

        env = os.environ.get("XDIFFUSION_MESH")
        if env:
            # "data=2,sequence=4" / "data=4,fsdp=2" — names and sizes of
            # every mesh axis, product must equal the device count.
            pairs = [p.split("=") for p in env.split(",") if p]
            axis_names = tuple(name for name, _ in pairs)
            shape = tuple(int(size) for _, size in pairs)
        else:
            shape = (n,) + (1,) * (len(axis_names) - 1)
    assert len(shape) == len(axis_names), (shape, axis_names)
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the data axis.

    Single-process: device_put with the batch sharding. Multi-process
    (TPU pod slices): the batch is this HOST's local shard of the global
    batch, assembled into a logically-global array via
    jax.make_array_from_process_local_data (per-host data loading,
    SURVEY §2.14)."""
    if jax.process_count() > 1:
        from xdiffusion_tpu.parallel.distributed import (
            global_batch_from_local,
        )

        return global_batch_from_local(batch, mesh)
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def fsdp_param_shardings(params, mesh: Mesh, min_size: Optional[int] = None):
    """ZeRO-3 style parameter sharding rules.

    Each parameter is sharded along its largest dimension divisible by the
    fsdp axis size; parameters with no such dimension (or too small to be
    worth scattering) are replicated. XLA then inserts the all-gathers on
    use and reduce-scatters on the gradient, overlapping them with compute.

    min_size: smallest parameter (elements) worth scattering — below it
    the all-gather latency outweighs the memory win. Default 2**16,
    overridable via XDIFFUSION_FSDP_MIN_SIZE.
    """
    import os

    fsdp = mesh.shape["fsdp"]
    if min_size is None:
        min_size = int(os.environ.get("XDIFFUSION_FSDP_MIN_SIZE", 2**16))

    def rule(p):
        if fsdp == 1 or p.ndim == 0 or p.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(p.ndim), key=lambda d: -p.shape[d])
        for d in dims:
            if p.shape[d] % fsdp == 0:
                spec = [None] * p.ndim
                spec[d] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


# Megatron-style tensor-parallel rules for transformer blocks: qkv and
# MLP-in kernels split their OUTPUT features ("column parallel"), the
# attention output projection and MLP-out kernels split their INPUT
# features ("row parallel"). With these parameter annotations GSPMD
# propagates the activation shardings and inserts exactly one all-reduce
# per block on the row-parallel matmuls — no shard_map or manual psum.
_TP_COLUMN_PATTERNS = (r"qkv/kernel$", r"qkv/bias$", r"mlp_fc1/kernel$",
                       r"mlp_fc1/bias$", r"kv/kernel$", r"kv/bias$",
                       r"q/kernel$", r"q/bias$", r"ff_geglu_\d+/kernel$")
_TP_ROW_PATTERNS = (r"attn/proj/kernel$", r"mlp_fc2/kernel$",
                    r"cross_attn/proj/kernel$", r"ff_out_\d+/kernel$")


def tensor_param_shardings(params, mesh: Mesh, fsdp_fallback: bool = True):
    """Tensor-parallel parameter shardings over the 'tensor' mesh axis,
    with ZeRO-3 fallback over 'fsdp' for everything unmatched.

    Column-parallel kernels shard their last dim, row-parallel kernels
    their first (contracting) dim. Parameters whose dims don't divide the
    axis size fall through to the fsdp rule.
    """
    import re

    from flax.traverse_util import flatten_dict, unflatten_dict

    tp = mesh.shape.get("tensor", 1)
    fsdp_rules = (
        fsdp_param_shardings(params, mesh)
        if fsdp_fallback and "fsdp" in mesh.shape
        else jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)
    )
    flat = flatten_dict(params, sep="/") if isinstance(params, dict) else None
    if flat is None or tp == 1:
        return fsdp_rules
    flat_rules = flatten_dict(fsdp_rules, sep="/")
    out = {}
    for path, leaf in flat.items():
        rule = flat_rules[path]
        if any(re.search(p, path) for p in _TP_COLUMN_PATTERNS):
            if leaf.shape[-1] % tp == 0:
                spec = [None] * leaf.ndim
                spec[-1] = "tensor"
                rule = NamedSharding(mesh, P(*spec))
        elif any(re.search(p, path) for p in _TP_ROW_PATTERNS):
            if leaf.ndim >= 2 and leaf.shape[0] % tp == 0:
                spec = [None] * leaf.ndim
                spec[0] = "tensor"
                rule = NamedSharding(mesh, P(*spec))
        out[path] = rule
    return unflatten_dict(out, sep="/")


def expert_param_shardings(params, mesh: Mesh, fsdp_fallback: bool = True):
    """Expert-parallel sharding rules over the 'expert' mesh axis.

    Stacked expert kernels (layers/moe.py: ``experts_fc1``/``experts_fc2``
    and their biases, leading axis = expert index) shard dim 0 over
    'expert'; the router and every non-MoE parameter fall through to the
    ZeRO-3 fsdp rule (or replication). GSPMD then derives the
    all-to-all that moves dispatched capacity slots onto their expert's
    device from the dispatch einsum's operand shardings — the EP analogue
    of how the fsdp rules imply all-gather/reduce-scatter.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    ep = mesh.shape.get("expert", 1)
    fsdp_rules = (
        fsdp_param_shardings(params, mesh)
        if fsdp_fallback and "fsdp" in mesh.shape
        else jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)
    )
    flat = flatten_dict(params, sep="/") if isinstance(params, dict) else None
    if flat is None or ep == 1:
        return fsdp_rules
    flat_rules = flatten_dict(fsdp_rules, sep="/")
    # Expected rank of each stacked-expert parameter (layers/moe.py). A
    # rank one higher means an extra leading layer axis (e.g. pipeline
    # stacking via stack_block_params) — then the expert axis is dim 1,
    # not dim 0.
    _EXPERT_NDIM = {
        "experts_fc1": 3,
        "experts_fc2": 3,
        "experts_fc1_bias": 2,
        "experts_fc2_bias": 2,
    }
    out = {}
    for path, leaf in flat.items():
        rule = flat_rules[path]
        name = path.split("/")[-1]
        if name in _EXPERT_NDIM:
            base_ndim = _EXPERT_NDIM[name]
            expert_dim = 0 if leaf.ndim == base_ndim else 1
            if (
                leaf.ndim in (base_ndim, base_ndim + 1)
                and leaf.shape[expert_dim] % ep == 0
            ):
                spec = [None] * leaf.ndim
                spec[expert_dim] = "expert"
                rule = NamedSharding(mesh, P(*spec))
        out[path] = rule
    return unflatten_dict(out, sep="/")
