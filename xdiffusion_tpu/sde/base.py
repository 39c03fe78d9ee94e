"""SDE protocol (reference: /root/reference/xdiffusion/sde/base.py:5-155).

An SDE here is a small stateless object exposing drift/diffusion and
marginal statistics as pure functions; reverse-time construction happens
inside the sampler step functions rather than via a dynamically-built
subclass (the reference's `reverse()` trick does not map onto traced
programs).
"""

from __future__ import annotations

from typing import Tuple

import jax


class SDE:
    """Forward-time SDE dx = f(x,t) dt + g(t) dW on t in [0, T]."""

    def __init__(self, N: int = 1000, T: float = 1.0):
        self.N = int(N)  # discretization steps
        self.T = float(T)

    def sde(self, x: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Returns (drift, diffusion)."""
        raise NotImplementedError

    def marginal_prob(self, x: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Mean/std of p_t(x(t) | x(0))."""
        raise NotImplementedError

    def prior_logp(self, z: jax.Array) -> jax.Array:
        raise NotImplementedError

    def discretize(self, x: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Generic Euler-Maruyama discretization: x_{i+1} = x_i + f_i + G_i z
        with f = drift*dt, G = diffusion*sqrt(dt) (dt = T/N). Subclasses with
        exact discrete forms (DDPM for VP) override this."""
        dt = self.T / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * (dt**0.5)

    def sigma_t(self, t) -> jax.Array:
        """Sampling-time diffusion coefficient."""
        raise NotImplementedError

    def noise_scale(self) -> float:
        return 1.0
