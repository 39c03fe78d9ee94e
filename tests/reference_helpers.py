"""Shared helper for tests that import the reference PyTorch package.

The reference tree at /root/reference is read-only and has optional deps
(audio/vision/accelerate) that aren't needed for numerics; they are
stubbed with spec-complete module objects so `transformers`' import-time
find_spec probing doesn't choke.
"""

import importlib.machinery
import os
import sys
import types

REFERENCE = "/root/reference"


def _stub(name):
    mod = types.ModuleType(name)
    mod.__path__ = []
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    sys.modules[name] = mod
    return mod


def import_reference():
    """Put the reference package on sys.path with deps stubbed; returns
    the `xdiffusion` module or raises ImportError/SkipTest conditions the
    caller turns into pytest.skip."""
    if not os.path.isdir(REFERENCE):
        raise ImportError("reference tree not mounted")
    for name in (
        "soundfile",
        "librosa",
        "accelerate",
        "einops_exts",
        "lpips",
        "torchinfo",
        "xformers",
        "xformers.ops",
        "flash_attn",
    ):
        try:
            __import__(name)
        except Exception:
            mod = _stub(name)
            if name == "torchinfo":
                mod.summary = lambda *a, **k: None
    try:
        import torchvision.transforms  # noqa: F401
    except Exception:
        tv = _stub("torchvision")
        tr = _stub("torchvision.transforms")
        tr.v2 = types.SimpleNamespace()
        _stub("torchvision.transforms.v2")
        tv.transforms = tr
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import xdiffusion

    return xdiffusion


def randomize_zero_init(sd, std=0.05, seed=0):
    """Replace all-zero tensors in a torch state_dict with small random
    values, returning a new dict.

    The reference zero-initializes adaLN gates and output projections
    (e.g. reference score_networks/dit.py:169-180), which makes a
    random-init forward pass insensitive to most layers (DiT's output is
    identically zero). Golden-parity tests must load the randomized dict
    into BOTH stacks so every layer contributes to the compared output.

    Shared modules (the reference registers its projections ModuleDict
    under every RunProjection head) alias the same tensor under several
    keys; aliases get the SAME replacement so load_state_dict stays
    consistent.
    """
    import zlib

    import torch

    def canonical(k):
        # The reference registers its shared projections ModuleDict under
        # every RunProjection head, duplicating the same parameter under
        # `_context_transformers.<i>._projections....` — canonicalize so
        # every alias draws the SAME replacement (torch returns distinct
        # tensor objects per key, so identity can't be used).
        idx = k.find("_projections.")
        return k[idx:] if idx > 0 else k

    by_name = {}
    out = {}
    for k in sorted(sd.keys()):
        v = sd[k]
        name = canonical(k)
        if name in by_name:
            out[k] = by_name[name]
            continue
        if (
            v.numel() > 0
            and v.is_floating_point()
            and bool((v == 0).all())
        ):
            g = torch.Generator().manual_seed(
                seed + zlib.crc32(name.encode())
            )
            r = torch.randn(v.shape, generator=g, dtype=torch.float32) * std
            out[k] = r.to(v.dtype)
        else:
            out[k] = v
        by_name[name] = out[k]
    return out


def build_reference_score_network(config_path: str):
    """Instantiate the reference score network from a YAML (struct
    semantics, reference ddpm.py:63) in eval mode."""
    import_reference()
    from xdiffusion.utils import instantiate_from_config, load_yaml

    cfg = load_yaml(config_path)
    net = instantiate_from_config(
        cfg.diffusion.score_network, use_config_struct=True
    )
    net.eval()
    return net, cfg
