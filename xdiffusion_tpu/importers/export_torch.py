"""Flax params -> PyTorch-reference state_dict exporter (the inverse of
importers/torch_state_dict.py for the flagship UNet).

Purpose: cross-stack quality verification (the north-star "FID within a
few % of the PyTorch reference"): a model TRAINED in this framework is
exported into the reference `score_networks/unet.py` module, so both
stacks can sample from identical weights and their FID / sample
statistics can be compared (reference checkpoint contract:
training/image/train.py:582-604).

Layout inversions mirror the importer exactly:
- flax Dense (I, O)        -> torch Linear (O, I)
- flax Conv HWIO           -> torch Conv2d OIHW
- fused qkv/kv Dense       -> torch Conv1d(k=1) with per-head (q,k,v)
  row interleaving (reference QKVAttention layout)
- proj_out Dense           -> torch Conv1d(k=1)
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from flax.traverse_util import flatten_dict

Array = np.ndarray


def _to_np(v) -> Array:
    return np.asarray(v, dtype=np.float32)


def _dense_T(w: Array) -> Array:
    return w.T


def _conv2d_T(w: Array) -> Array:
    """flax HWIO -> torch OIHW."""
    return w.transpose(3, 2, 0, 1)


def _dense_to_conv1d(w: Array) -> Array:
    """flax Dense kernel (I, O) -> torch Conv1d weight (O, I, 1)."""
    return w.T[:, :, None]


def _qkv_interleave(parts: int, num_heads: int, conv1d: bool):
    """Inverse of importer._qkv_deinterleave: our per-part (q_all, k_all,
    v_all) rows -> reference per-head (q, k, v) interleaved rows."""

    def tf(w: Array) -> Array:
        if w.ndim == 2:  # Dense kernel (I, O)
            w2 = w.T  # (O, I)
            out, cin = w2.shape
            ch = out // (parts * num_heads)
            w2 = (
                w2.reshape(parts, num_heads, ch, cin)
                .transpose(1, 0, 2, 3)
                .reshape(out, cin)
            )
            return w2[:, :, None] if conv1d else w2
        out = w.shape[0]  # bias (O,)
        ch = out // (parts * num_heads)
        return w.reshape(parts, num_heads, ch).transpose(1, 0, 2).reshape(out)

    return tf


def export_unet_params(
    flax_params: Dict,
    *,
    heads: int = 8,
    dim_head: int = 64,
) -> Dict[str, Array]:
    """Export our `score_networks.unet.Unet` param tree into a reference
    UNet state_dict (numpy tensors; wrap with torch.from_numpy to load).

    Mirrors importer.import_unet_params' resolve() in reverse; raises on
    any unmapped leaf so a silent partial export can't happen.
    """
    import re

    from xdiffusion_tpu.importers.torch_state_dict import (
        _MIDDLE_RE,
        _PROJ_RE,
        _STAGE_RE,
    )

    def attn_heads(channels: int) -> int:
        return heads if dim_head == -1 else channels // dim_head

    def leaf_name(base: str, leaf: str) -> str:
        if leaf in ("scale", "kernel", "weight", "embedding"):
            return base + ".weight"
        return base + "." + leaf

    sd: Dict[str, Array] = {}
    flat = flatten_dict(flax_params)
    for path, value in flat.items():
        sub = tuple(str(p) for p in (path[1:] if path[0] == "params" else path))
        top, leaf = sub[0], sub[-1]
        w = _to_np(value)

        m = _PROJ_RE.match(top)
        if m:
            base = f"_projections.{m.group(1)}"
            if sub[1] == "fc1":
                sd[leaf_name(f"{base}._projection.1", leaf)] = (
                    _dense_T(w) if leaf == "kernel" else w
                )
                continue
            if sub[1] == "fc2":
                sd[leaf_name(f"{base}._projection.3", leaf)] = (
                    _dense_T(w) if leaf == "kernel" else w
                )
                continue
            if sub[1] in ("embed", "table"):
                sd[f"{base}.embedding_table.weight"] = w
                continue
        if top == "_label_projection":
            sd["_label_projection.weight"] = w
            continue
        if top == "initial_conv":
            sd["_initial_convolution.weight"] = _conv2d_T(w)
            continue
        if top == "final_norm":
            sd[leaf_name("final_projection.0", leaf)] = w
            continue
        if top == "final_conv":
            sd["final_projection.2.weight"] = _conv2d_T(w)
            continue

        m = _STAGE_RE.match(top) or _MIDDLE_RE.match(top)
        if m is None:
            raise KeyError(f"unmapped flax path in export: {'/'.join(sub)}")
        if m.re is _MIDDLE_RE:
            base = f"middle.{m.group(1)}"
            pyramid = "middle"
        else:
            pyramid, i, j = m.group(1), m.group(2), m.group(3)
            base = f"{pyramid}.{i}.{j}"
        child = sub[1]

        biggan = {
            "norm1": "in_layers.0",
            "conv1": "in_layers.2",
            "emb_proj": "emb_layers.1",
            "norm2": "out_layers.0",
            "conv2": "out_layers.3",
            "skip": "skip_connection",
        }
        if child in biggan:
            suffix = biggan[child]
            key = leaf_name(f"{base}.{suffix}", leaf)
            if leaf == "kernel":
                sd[key] = _dense_T(w) if w.ndim == 2 else _conv2d_T(w)
            else:
                sd[key] = w
            continue
        if child in ("qkv", "encoder_kv"):
            parts = 3 if child == "qkv" else 2
            c = (w.shape[-1] if w.ndim == 2 else w.shape[0]) // parts
            tf = _qkv_interleave(parts, attn_heads(c), conv1d=True)
            sd[leaf_name(f"{base}._{child}", leaf)] = tf(w)
            continue
        if child == "proj_out":
            if leaf == "kernel":
                sd[f"{base}._proj_out.weight"] = _dense_to_conv1d(w)
            else:
                sd[f"{base}._proj_out.bias"] = w
            continue
        if child == "norm":
            sd[leaf_name(f"{base}._norm", leaf)] = w
            continue
        if child == "context_norm":
            sd[leaf_name(f"{base}._context_layer_norm", leaf)] = w
            continue
        if child == "conv":
            op = "op" if pyramid == "downs" else "conv"
            if leaf == "kernel":
                sd[f"{base}.{op}.weight"] = _conv2d_T(w)
            else:
                sd[f"{base}.{op}.bias"] = w
            continue
        raise KeyError(f"unmapped flax path in export: {'/'.join(sub)}")
    return sd
