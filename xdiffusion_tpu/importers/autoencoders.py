"""Torch-reference autoencoder state_dicts -> flax params.

Covers the LDM image VAE (`AutoencoderKL`, reference autoencoders/
kl.py:9-148 built from layers.py:8-371), whose module tree is:

    encoder.conv_in / encoder.down.{l}.block.{i}.{norm1,conv1,norm2,
    conv2,nin_shortcut} / encoder.down.{l}.attn.{i}.{norm,q,k,v,proj_out}
    / encoder.down.{l}.downsample.conv / encoder.mid.{block_1,attn_1,
    block_2} / encoder.{norm_out,conv_out} ; decoder symmetric with
    up.{l}.{block,attn,upsample} ; quant_conv / post_quant_conv.

Our flax module (`autoencoders/kl.py`) names the same structure
encoder/down_{l}_block_{i}(norm1,conv1,norm2,conv2,skip),
down_{l}_attn_{i}(norm,q,k,v,proj), down_{l}_downsample, mid_block_1,
mid_attn, mid_block_2, norm_out, conv_out (decoder: up_*). Layout
conversions are the standard ones (Conv2d OIHW->HWIO; the attention's
1x1 convs -> Dense (I, O)); `loss.*` keys (discriminator + logvar) are
ignored — the GAN loss has its own parameter tree here.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from xdiffusion_tpu.importers.torch_state_dict import (
    Array,
    Transform,
    _apply_mapping,
    _conv2d,
    _identity,
)


def _conv1x1_dense(w: Array) -> Array:
    """torch Conv2d(k=1) channel mixer (O, I, 1, 1) -> Dense (I, O)."""
    return w[:, :, 0, 0].T


_BLOCK_RE = re.compile(r"^(down|up)_(\d+)_block_(\d+)$")
_ATTN_RE = re.compile(r"^(down|up)_(\d+)_attn_(\d+)$")
_RESAMPLE_RE = re.compile(r"^(down|up)_(\d+)_(downsample|upsample)$")

# flax child -> (torch suffix, weight transform); norms use _identity.
_RES_LEAVES = {
    "norm1": ("norm1", None),
    "conv1": ("conv1", _conv2d),
    "norm2": ("norm2", None),
    "conv2": ("conv2", _conv2d),
    "skip": ("nin_shortcut", _conv2d),
}
_ATTN_LEAVES = {
    "norm": ("norm", None),
    "q": ("q", _conv1x1_dense),
    "k": ("k", _conv1x1_dense),
    "v": ("v", _conv1x1_dense),
    "proj": ("proj_out", _conv1x1_dense),
}


def _leaf(base: str, flax_leaf: str) -> str:
    return base + (".weight" if flax_leaf in ("scale", "kernel") else ".bias")


def _resolve_coder(tower: str, path: Tuple[str, ...]):
    """Resolve one leaf inside encoder/decoder. `path` excludes the tower
    name, e.g. ("down_0_block_1", "conv1", "kernel")."""
    top, leaf = path[0], path[-1]

    if top in ("conv_in", "conv_out"):
        return (_leaf(f"{tower}.{top}", leaf), _conv2d if leaf == "kernel" else _identity)
    if top == "norm_out":
        return (_leaf(f"{tower}.norm_out", leaf), _identity)
    if top in ("mid_block_1", "mid_block_2"):
        n = top[len("mid_block_") :]
        child = path[1]
        suffix, tf = _RES_LEAVES[child]
        base = f"{tower}.mid.block_{n}.{suffix}"
        return (_leaf(base, leaf), tf if leaf == "kernel" else _identity)
    if top == "mid_attn":
        child = path[1]
        suffix, tf = _ATTN_LEAVES[child]
        base = f"{tower}.mid.attn_1.{suffix}"
        return (_leaf(base, leaf), tf if leaf == "kernel" else _identity)

    m = _BLOCK_RE.match(top)
    if m:
        lvl, i = m.group(2), m.group(3)
        child = path[1]
        suffix, tf = _RES_LEAVES[child]
        base = f"{tower}.{m.group(1)}.{lvl}.block.{i}.{suffix}"
        return (_leaf(base, leaf), tf if leaf == "kernel" else _identity)
    m = _ATTN_RE.match(top)
    if m:
        lvl, i = m.group(2), m.group(3)
        child = path[1]
        suffix, tf = _ATTN_LEAVES[child]
        base = f"{tower}.{m.group(1)}.{lvl}.attn.{i}.{suffix}"
        return (_leaf(base, leaf), tf if leaf == "kernel" else _identity)
    m = _RESAMPLE_RE.match(top)
    if m:
        base = f"{tower}.{m.group(1)}.{m.group(2)}.{m.group(3)}.conv"
        return (_leaf(base, leaf), _conv2d if leaf == "kernel" else _identity)
    return None


def import_autoencoder_kl_params(
    flax_params: Dict, sd: Dict[str, Array], strict: bool = True
) -> Dict:
    """Import a reference `AutoencoderKL` state_dict into the params of
    `xdiffusion_tpu.autoencoders.kl._AutoencoderKLModule` (the "ae"
    subtree — pass `params["ae"]`)."""

    def resolve(path: Tuple[str, ...]) -> Optional[Tuple[str, Transform]]:
        top, leaf = path[0], path[-1]
        if top in ("quant_conv", "post_quant_conv"):
            return (_leaf(top, leaf), _conv2d if leaf == "kernel" else _identity)
        if top in ("encoder", "decoder"):
            return _resolve_coder(top, path[1:])
        return None

    return _apply_mapping(flax_params, sd, resolve, strict=strict)
