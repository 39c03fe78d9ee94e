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
    # The reference autoencoders/losses.py imports torchvision.models and
    # torch_dwt.functional.dwt3 at module import time (losses.py:11-12);
    # hunyuan.py pulls losses in transitively. Only the attributes need to
    # exist for import — VGG/LPIPS weights never load in this env.
    tv_mod = sys.modules.get("torchvision")
    if tv_mod is not None and not hasattr(tv_mod, "models"):
        tv_models = _stub("torchvision.models")
        tv_mod.models = tv_models
    try:
        import torch_dwt  # noqa: F401
    except Exception:
        td = _stub("torch_dwt")
        tdf = _stub("torch_dwt.functional")
        tdf.dwt3 = None
        td.functional = tdf
    _install_functional_xformers()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import xdiffusion

    return xdiffusion


def _install_functional_xformers():
    """The reference's MultiHeadCrossAttention (layers/sora.py:378-411)
    requires xformers.ops.memory_efficient_attention with a
    BlockDiagonalMask; this box has no xformers, so give the stub a
    numerically-exact torch implementation (per-sample softmax attention
    over the packed sequence) so the reference Sora can run for parity
    tests."""
    ops = sys.modules.get("xformers.ops")
    if ops is None or hasattr(ops, "memory_efficient_attention"):
        return
    parent = sys.modules.get("xformers")
    if parent is not None:
        parent.ops = ops
    import torch

    class _BlockDiagonalMask:
        def __init__(self, q_seqlen, kv_seqlen):
            self.q_seqlen = list(q_seqlen)
            self.kv_seqlen = list(kv_seqlen)

        @classmethod
        def from_seqlens(cls, q_seqlen, kv_seqlen=None):
            return cls(q_seqlen, kv_seqlen if kv_seqlen is not None else q_seqlen)

    def memory_efficient_attention(q, k, v, p=0.0, attn_bias=None):
        # q/k/v: (B, M, H, D); output matches q's layout.
        assert p == 0.0 or not torch.is_grad_enabled()
        scale = q.shape[-1] ** -0.5
        if attn_bias is None:
            qh, kh, vh = (t.permute(0, 2, 1, 3) for t in (q, k, v))
            w = torch.softmax((qh @ kh.transpose(-2, -1)) * scale, dim=-1)
            return (w @ vh).permute(0, 2, 1, 3)
        assert q.shape[0] == 1, "packed layout expected with BlockDiagonalMask"
        qo, ko, vo = q[0], k[0], v[0]
        outs = []
        qs = ks = 0
        for ql, kl in zip(attn_bias.q_seqlen, attn_bias.kv_seqlen):
            qi = qo[qs : qs + ql].permute(1, 0, 2)
            ki = ko[ks : ks + kl].permute(1, 0, 2)
            vi = vo[ks : ks + kl].permute(1, 0, 2)
            w = torch.softmax((qi @ ki.transpose(-2, -1)) * scale, dim=-1)
            outs.append((w @ vi).permute(1, 0, 2))
            qs += ql
            ks += kl
        return torch.cat(outs, dim=0)[None]

    ops.memory_efficient_attention = memory_efficient_attention
    fmha = types.ModuleType("xformers.ops.fmha")
    fmha.BlockDiagonalMask = _BlockDiagonalMask
    fmha.__spec__ = importlib.machinery.ModuleSpec(
        "xformers.ops.fmha", None, is_package=False
    )
    sys.modules["xformers.ops.fmha"] = fmha
    ops.fmha = fmha


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
