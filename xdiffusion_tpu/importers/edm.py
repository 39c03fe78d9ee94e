"""Torch state_dict importers for the EDM backbones (SongUNet /
DhariwalUNet, reference score_networks/edm.py:18-399).

The flax modules carry the reference ModuleDict key names
(enc_{res}x{res}_block{i}, dec_{res}x{res}_up, ...) so mapping is a
mechanical rename plus layout transforms. The one nontrivial transform is
the fused qkv 1x1 conv, whose torch rows are ordered (head, channel, part)
— reference layers/edm.py:330-337 reshapes (B, 3C, HW) to
(B*nh, cph, 3, HW) — while our Dense emits part-major (q_all, k_all,
v_all) rows.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from xdiffusion_tpu.importers.torch_state_dict import (
    Array,
    _apply_mapping,
    _conv2d,
    _dense,
    _identity,
    _leaf_name,
)

_EDM_TOP_RE = re.compile(r"^(enc|dec)_(\d+x\d+)_(.+)$")


def _edm_qkv(num_heads: int):
    """(head, channel, part)-interleaved qkv rows -> part-major Dense."""

    def tf(w: Array) -> Array:
        if w.ndim == 4:  # conv 1x1 weight (3C, C, 1, 1)
            w = w[:, :, 0, 0]
        out = w.shape[0]
        cph = out // (3 * num_heads)
        if w.ndim == 1:  # bias
            return (
                w.reshape(num_heads, cph, 3).transpose(2, 0, 1).reshape(out)
            )
        cin = w.shape[1]
        return (
            w.reshape(num_heads, cph, 3, cin)
            .transpose(2, 0, 1, 3)
            .reshape(out, cin)
            .T
        )

    return tf


def _conv1x1_dense(w: Array) -> Array:
    """torch Conv2d(k=1) weight (O, I, 1, 1) -> Dense kernel (I, O)."""
    return w[:, :, 0, 0].T


def import_edm_unet_params(
    flax_params: Dict,
    sd: Dict[str, Array],
    *,
    arch: str = "song",
    channels_per_head: int = 64,
    strict: bool = True,
) -> Dict:
    """Import a reference SongUNet/DhariwalUNet state_dict into our
    `score_networks.edm.SongUNetModule`/`DhariwalUNetModule` param tree.

    arch='song' fixes attention num_heads=1 (reference block_kwargs,
    score_networks/edm.py:67); arch='adm' derives heads from
    channels_per_head=64 (reference :280).
    """

    def attn_heads(c: int) -> int:
        if arch == "song":
            return 1
        return max(1, c // channels_per_head)

    def block_child(base: str, child: str, leaf: str, path: Tuple[str, ...]):
        if child in ("norm0", "norm1", "norm2"):
            return (_leaf_name(f"{base}.{child}", leaf), _identity)
        if child in ("conv0", "conv1"):
            if leaf == "kernel":
                return (f"{base}.{child}.weight", _conv2d)
            return (f"{base}.{child}.bias", _identity)
        if child == "affine":
            if leaf == "kernel":
                return (f"{base}.affine.weight", _dense)
            return (f"{base}.affine.bias", _identity)
        if child == "skip":
            if leaf == "kernel":
                return (f"{base}.skip.weight", _conv2d)
            return (f"{base}.skip.bias", _identity)
        if child == "qkv":
            def tf(w):
                out = w.shape[0]
                return _edm_qkv(attn_heads(out // 3))(w)

            return (_leaf_name(f"{base}.qkv", leaf), tf)
        if child == "proj":
            if leaf == "kernel":
                return (f"{base}.proj.weight", _conv1x1_dense)
            return (f"{base}.proj.bias", _identity)
        return None

    def resolve(path: Tuple[str, ...]):
        top, leaf = path[0], path[-1]
        if top == "map_noise":  # Fourier freqs buffer
            return ("map_noise.freqs", _identity)
        if top in ("map_layer0", "map_layer1", "map_label", "map_augment"):
            return (
                _leaf_name(top, leaf),
                _dense if leaf == "kernel" else _identity,
            )
        if top == "out_norm":
            key = "out_norm" if "out_norm.weight" in sd else _song_aux(sd, "norm")
            return (_leaf_name(key, leaf), _identity)
        if top == "out_conv":
            key = "out_conv" if "out_conv.weight" in sd else _song_aux(sd, "conv")
            if leaf == "kernel":
                return (f"{key}.weight", _conv2d)
            return (f"{key}.bias", _identity)

        m = _EDM_TOP_RE.match(top)
        if m is None:
            return None
        base = f"{m.group(1)}.{m.group(2)}_{m.group(3)}"
        if m.group(3) == "conv":  # encoder stem conv
            if leaf == "kernel":
                return (f"{base}.weight", _conv2d)
            return (f"{base}.bias", _identity)
        if m.group(3) == "aux_residual":
            # FusedDownConv wraps one 3x3 conv child named "conv".
            if leaf == "kernel":
                return (f"{base}.weight", _conv2d)
            return (f"{base}.bias", _identity)
        return block_child(base, path[1], leaf, path)

    return _apply_mapping(flax_params, sd, resolve, strict=strict)


def _song_aux(sd: Dict[str, Array], kind: str) -> str:
    """SongUNet's output head lives at dec.{R}x{R}_aux_{norm,conv}
    (reference :184-189, standard decoder => level 0 only)."""
    pat = re.compile(rf"^dec\.(\d+)x(\d+)_aux_{kind}\.weight$")
    best = None
    for k in sd:
        m = pat.match(k)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), k[: -len(".weight")])
    if best is None:
        raise KeyError(f"no aux_{kind} head in state_dict")
    return best[1]
