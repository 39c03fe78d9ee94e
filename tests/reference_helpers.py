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
