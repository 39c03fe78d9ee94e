"""LoRA as functional parameter-tree surgery.

Behavioral counterpart of /root/reference/xdiffusion/lora.py:15-377, recast
for JAX: instead of swapping nn.Modules in place, LoRA is a *parallel
pytree* of (down, up) factor pairs keyed by the same paths as the kernels
they adapt. Training optimizes only the LoRA tree; the forward pass uses
`apply_lora(base_params, lora_params)` which adds scale * down @ up to
each adapted kernel — one fused elementwise+matmul per kernel that XLA
folds into the step. Merging for export is the same operation.

Default adaptation targets mirror the reference's module classes
(attention qkv/out projections, GLU/MLP and resnet-block kernels).
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

# Path-component regexes marking kernels to adapt; mirrors the reference's
# DEFAULT_TARGET_REPLACE = {CrossAttention, Attention, GEGLU,
# SpatialCrossAttention, ResnetBlock*} targets (lora.py:4-12).
DEFAULT_TARGET_PATTERNS = (
    r"qkv",
    r"encoder_kv",
    r"proj_out",
    r"proj",
    r"attn",
    r"mlp_fc\d",
    r"conv\d",
    r"emb_proj",
)


def _matches(path: Tuple[str, ...], patterns: Sequence[str]) -> bool:
    joined = "/".join(path)
    return any(re.search(p, joined) for p in patterns)


def inject_trainable_lora(
    params: Any,
    rng: jax.Array,
    r: int = 4,
    scale: float = 1.0,
    target_patterns: Sequence[str] = DEFAULT_TARGET_PATTERNS,
) -> Dict:
    """Build a LoRA tree for every matching 2D+ kernel in `params`.

    Returns {"rank": r, "scale": scale, "weights": {path: {"down", "up"}}}.
    down ~ N(0, 1/r), up = 0, so the adapted model starts exactly at the
    base model (reference init semantics, lora.py:15-55).
    """
    flat = flatten_dict(params)
    weights = {}
    for path, kernel in flat.items():
        if path[-1] != "kernel":
            continue
        if not _matches(path[:-1], target_patterns):
            continue
        if kernel.ndim < 2:
            continue
        in_dim = int(jnp.prod(jnp.asarray(kernel.shape[:-1])))
        out_dim = kernel.shape[-1]
        rng, sub = jax.random.split(rng)
        down = jax.random.normal(sub, (in_dim, r), dtype=jnp.float32) / r
        up = jnp.zeros((r, out_dim), dtype=jnp.float32)
        weights[path] = {"down": down, "up": up}
    return {"rank": r, "scale": scale, "weights": weights}


def apply_lora(params: Any, lora: Dict) -> Any:
    """Effective params: kernel + scale * reshape(down @ up). Pure."""
    if lora is None:
        return params
    flat = dict(flatten_dict(params))
    scale = lora["scale"]
    for path, w in lora["weights"].items():
        kernel = flat[path]
        delta = (w["down"] @ w["up"]).reshape(kernel.shape)
        flat[path] = kernel + scale * delta.astype(kernel.dtype)
    return unflatten_dict(flat)


def merge_lora(params: Any, lora: Dict) -> Any:
    """Permanently fold the LoRA weights into the base parameters."""
    return apply_lora(params, lora)


def lora_param_count(lora: Dict) -> int:
    return sum(
        int(w["down"].size + w["up"].size) for w in lora["weights"].values()
    )


def save_lora_weights(lora: Dict, path: str) -> None:
    host = jax.tree_util.tree_map(lambda x: jax.device_get(x), lora)
    # Tuple keys aren't JSON-able; pickle the host tree.
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_lora_weights(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)
