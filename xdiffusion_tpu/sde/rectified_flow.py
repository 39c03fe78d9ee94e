"""Rectified-flow "SDE" shell (reference: sde/rectified_flow.py:4-28).

A trivial probability-flow ODE: zero diffusion coefficient, unit noise
scale. Exists so the rectified-flow sampler and configs share the SDE
protocol with the score-SDE family.
"""

from __future__ import annotations

import jax.numpy as jnp

from xdiffusion_tpu.sde.base import SDE


class RectifiedFlow(SDE):
    def __init__(self, N: int = 1000, T: float = 1.0, **kwargs):
        super().__init__(N=N, T=T)

    def sigma_t(self, t):
        return jnp.zeros_like(jnp.asarray(t, dtype=jnp.float32))

    def noise_scale(self) -> float:
        return 1.0
