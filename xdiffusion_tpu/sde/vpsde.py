"""Variance-preserving SDE (Score-SDE Eq. 11).

Behavioral counterpart of /root/reference/xdiffusion/sde/vpsde.py:8-101.
Pure functions of jax arrays; constant tables precomputed at build time.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.sde.base import SDE
from xdiffusion_tpu.utils import broadcast_from_left


class VPSDE(SDE):
    def __init__(self, beta_min: float = 0.1, beta_max: float = 20.0,
                 N: int = 1000, T: float = 1.0, **kwargs):
        super().__init__(N=N, T=T)
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)
        betas = np.linspace(beta_min / N, beta_max / N, N, dtype=np.float64)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        self.discrete_betas = jnp.asarray(betas, jnp.float32)
        self.alphas = jnp.asarray(alphas, jnp.float32)
        self.sqrt_alphas_cumprod = jnp.asarray(np.sqrt(ac), jnp.float32)
        self.sqrt_1m_alphas_cumprod = jnp.asarray(np.sqrt(1.0 - ac), jnp.float32)

    def sde(self, x: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = -0.5 * broadcast_from_left(beta_t, x.shape) * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def marginal_prob(self, x: jax.Array, t: jax.Array):
        log_mean_coeff = (
            -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        )
        mean = broadcast_from_left(jnp.exp(log_mean_coeff), x.shape) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        return mean, std

    def prior_sampling(self, rng: jax.Array, shape) -> jax.Array:
        return jax.random.normal(rng, shape)

    def prior_logp(self, z: jax.Array) -> jax.Array:
        n = np.prod(z.shape[1:])
        return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(
            z.reshape(z.shape[0], -1) ** 2, axis=-1
        ) / 2.0

    def discretize(self, x: jax.Array, t: jax.Array):
        """DDPM discretization: f = (sqrt(alpha)-1)x, G = sqrt(beta)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        beta = jnp.take(self.discrete_betas, timestep)
        alpha = jnp.take(self.alphas, timestep)
        f = broadcast_from_left(jnp.sqrt(alpha), x.shape) * x - x
        g = jnp.sqrt(beta)
        return f, g
