"""Model-summary printout (torchinfo analogue).

The reference prints a torchinfo table of the score network with a
fully-populated fake context at trainer startup
(/root/reference/xdiffusion/diffusion/ddpm.py:694-793, called from
training/image/train.py:157 and the other trainers). The JAX-native
equivalent is `flax.linen.tabulate`, which traces the module abstractly
(no device compute) and renders the same per-layer path / input / output
/ param-count table.

`model_summary` works for every diffusion-process family:

- DDPM-family (`GaussianDiffusion_DDPM` and subclasses): uses the
  process's `example_batch` — the de-facto contract of the context
  protocol — so the summary doubles as a startup signature check of the
  score network, exactly like the reference.
- Score-SDE: `(x, {"timestep": t})` with continuous time.
- EDM / consistency: the preconditioned `(x, sigma)` signature.
- Cascades: one table per stage.

Trainers print this at startup unless `XDIFFUSION_MODEL_SUMMARY=0`
(tests disable it; tracing a large net costs a few seconds).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp


def summary_enabled() -> bool:
    return os.environ.get("XDIFFUSION_MODEL_SUMMARY", "1") not in ("0", "false")


def _tabulate(module, args: tuple, depth: int, width: int) -> str:
    import flax.linen as nn

    tab = nn.tabulate(
        module,
        jax.random.PRNGKey(0),
        depth=depth,
        console_kwargs={"width": width, "force_terminal": False},
    )
    return tab(*args)


def model_summary(
    process: Any, batch_size: int = 2, depth: int = 1, width: int = 160
) -> str:
    """Render a torchinfo-style table for the process's score network(s).

    Mirrors the reference `print_model_summary` contract: the inputs are a
    fake batch + fully-populated fake context matching the config's input
    signature (reference ddpm.py:716-741).
    """
    from .diffusion.cascade import GaussianDiffusionCascade
    from .diffusion.consistency import GaussianDiffusion_ConsistencyModel
    from .diffusion.edm import GaussianDiffusion_EDM

    if isinstance(process, GaussianDiffusionCascade):
        parts = []
        for i, layer in enumerate(process.models()):
            parts.append(f"== Cascade stage {i + 1} ==")
            parts.append(model_summary(layer, batch_size, depth, width))
        return "\n".join(parts)

    if isinstance(
        process, (GaussianDiffusion_EDM, GaussianDiffusion_ConsistencyModel)
    ):
        data = process.config().data
        x = jnp.zeros(
            (batch_size, data.image_size, data.image_size, data.num_channels)
        )
        sigma = jnp.ones((batch_size,), dtype=jnp.float32)
        return _tabulate(process.score_network(), (x, sigma), depth, width)

    if hasattr(process, "example_batch"):
        x, context = process.example_batch(batch_size)
        return _tabulate(process.score_network(), (x, context), depth, width)

    # Score-SDE: continuous time in [0, 1].
    data = process.config().data
    x = jnp.zeros(
        (batch_size, data.image_size, data.image_size, data.num_channels)
    )
    context = {"timestep": jnp.zeros((batch_size,), dtype=jnp.float32)}
    return _tabulate(process.score_network(), (x, context), depth, width)


def print_model_summary(
    process: Any, batch_size: int = 2, depth: int = 1
) -> None:
    """Print the startup model summary on host 0 only.

    No-op when XDIFFUSION_MODEL_SUMMARY=0 or on non-zero hosts. Never
    fatal: a summary failure shouldn't kill a training run, so errors
    are reported and swallowed (the immediately-following real
    `init_params` will surface any genuine signature problem).
    """
    if not summary_enabled() or jax.process_index() != 0:
        return
    try:
        print(model_summary(process, batch_size=batch_size, depth=depth), flush=True)
    except Exception as e:  # pragma: no cover - defensive
        print(f"model summary unavailable: {e!r}", flush=True)
