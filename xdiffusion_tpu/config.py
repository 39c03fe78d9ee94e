"""Configuration system: YAML -> DotConfig + reflective instantiation.

Mirrors the behavioral contract of the reference config runtime
(/root/reference/xdiffusion/utils.py:25-260): every pluggable object in a
config is a `{target: dotted.path, params: {...}}` pair resolved by import
path. To keep the reference's YAML configs loadable unmodified, a registry
maps `xdiffusion.*` (and the few `torch.*` builtins that appear in configs)
onto this package's implementations.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Optional

import yaml


class DotConfig:
    """Dot-accessible view over a nested dict (reference: utils.py:25-48).

    Supports `cfg.a.b`, `"a" in cfg`, `cfg["a"]`, and `.to_dict()`.
    """

    def __init__(self, cfg: Dict):
        self._cfg = cfg

    def __getattr__(self, k):
        if k.startswith("_"):
            raise AttributeError(k)
        try:
            v = self._cfg[k]
        except KeyError as e:
            raise AttributeError(k) from e
        if isinstance(v, dict):
            return DotConfig(v)
        return v

    def __getitem__(self, k):
        v = self._cfg[k]
        if isinstance(v, dict):
            return DotConfig(v)
        return v

    def __contains__(self, k) -> bool:
        return k in self._cfg

    def __iter__(self):
        return iter(self._cfg)

    def keys(self):
        return self._cfg.keys()

    def get(self, k, default=None):
        v = self._cfg.get(k, default)
        if isinstance(v, dict):
            return DotConfig(v)
        return v

    def to_dict(self) -> Dict:
        return self._cfg

    def __repr__(self):
        return f"DotConfig({self._cfg!r})"


def load_yaml(path: str) -> DotConfig:
    """Load a YAML config file into a DotConfig (reference: utils.py:51)."""
    with open(path, "r") as f:
        return DotConfig(yaml.safe_load(f))


# ---------------------------------------------------------------------------
# Target registry
# ---------------------------------------------------------------------------

# Explicit aliases: reference dotted path -> our dotted path (or callable).
# Populated lazily below; extended by register_alias().
_ALIASES: Dict[str, str] = {}

# Reference module prefix rewrites, tried in order.
_PREFIX_REWRITES = [
    ("xdiffusion_tpu.", "xdiffusion_tpu."),  # identity (our own configs)
    ("xdiffusion.", "xdiffusion_tpu."),  # reference configs
    # The reference's earlier package name leaks into a few of its configs
    # (e.g. video/moving_mnist/make_a_video.yaml).
    ("image_diffusion.", "xdiffusion_tpu."),
]


def register_alias(reference_path: str, our_path: str) -> None:
    """Register an explicit dotted-path alias for config compatibility."""
    _ALIASES[reference_path] = our_path


def _builtin_aliases() -> Dict[str, str]:
    aliases = {
        # torch builtins that appear in reference configs (e.g.
        # configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml uses
        # `torch.nn.Identity` as the unconditional_context adapter and
        # pixart_alpha.yaml uses `torch.optim.Adam`/lr schedulers).
        "torch.nn.Identity": "xdiffusion_tpu.context.Identity",
        "torch.optim.Adam": "xdiffusion_tpu.optim.Adam",
        "torch.optim.AdamW": "xdiffusion_tpu.optim.AdamW",
        "torch.optim.lr_scheduler.LinearLR": "xdiffusion_tpu.optim.LinearLR",
        "torch.optim.lr_scheduler.ConstantLR": "xdiffusion_tpu.optim.ConstantLR",
        # Schedulers are immutable pytrees here; config targets resolve to
        # factory functions rather than the dataclass constructors.
        "scheduler.DiscreteNoiseScheduler": "scheduler.discrete_noise_scheduler",
        "scheduler.ContinuousNoiseScheduler": "scheduler.continuous_noise_scheduler",
        "scheduler.DiscreteRectifiedFlowNoiseScheduler": (
            "scheduler.rectified_flow_noise_scheduler"
        ),
    }
    out = {}
    for k, v in aliases.items():
        if k.startswith("torch."):
            out[k] = v
        else:
            # Register short module paths under both package roots.
            out["xdiffusion." + k] = "xdiffusion_tpu." + v
            out["xdiffusion_tpu." + k] = "xdiffusion_tpu." + v
    return out


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """Resolve a dotted path to a python object (reference: utils.py:255).

    Resolution order: explicit aliases, then prefix rewrites into this
    package, then the literal path.
    """
    aliases = dict(_builtin_aliases())
    aliases.update(_ALIASES)
    if string in aliases:
        string = aliases[string]

    candidates = []
    for ref_prefix, our_prefix in _PREFIX_REWRITES:
        if string.startswith(ref_prefix):
            candidates.append(our_prefix + string[len(ref_prefix) :])
    candidates.append(string)

    last_err: Optional[Exception] = None
    for cand in candidates:
        module_name, _, cls_name = cand.rpartition(".")
        if not module_name:
            continue
        try:
            module = importlib.import_module(module_name)
            if reload:
                importlib.reload(module)
            return getattr(module, cls_name)
        except (ImportError, AttributeError) as e:  # try next candidate
            last_err = e
    raise ImportError(f"Could not resolve config target {string!r}: {last_err}")


def instantiate_from_config(
    config, use_config_struct: bool = False, **extra_kwargs
) -> Any:
    """Instantiate `config.target` with `config.params` (reference: utils.py:207).

    When the config block carries `instantiate_with_config_struct: true` (or
    `use_config_struct` is passed), the target receives the params as a single
    DotConfig positional `config=` argument instead of kwargs.
    """
    if config is None:
        return None
    if isinstance(config, DotConfig):
        config = config.to_dict()
    if "target" not in config:
        raise KeyError(f"Expected `target` key in config block: {config}")
    cls = get_obj_from_str(config["target"])
    params = config.get("params", {}) or {}
    if use_config_struct or config.get("instantiate_with_config_struct", False):
        return cls(config=DotConfig(params), **extra_kwargs)
    return cls(**params, **extra_kwargs)


def instantiate_partial_from_config(config) -> Callable[..., Any]:
    """Return a partial constructor for `config.target` (reference: utils.py:228)."""
    if isinstance(config, DotConfig):
        config = config.to_dict()
    cls = get_obj_from_str(config["target"])
    params = config.get("params", {}) or {}

    def _ctor(**kwargs):
        return cls(**params, **kwargs)

    return _ctor


def type_from_config(config) -> Any:
    """Resolve just the class named by `config.target`."""
    if isinstance(config, DotConfig):
        config = config.to_dict()
    return get_obj_from_str(config["target"])
