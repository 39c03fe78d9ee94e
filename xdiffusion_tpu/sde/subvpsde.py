"""Sub-VP SDE (Score-SDE Eq. 29 family; excels at likelihoods).

Behavioral counterpart of /root/reference/xdiffusion/sde/subvpsde.py:6-54.
Note the reference's marginal std is 1 - exp(2*log_mean_coeff) (no sqrt) —
that is the defining property of sub-VP and is preserved here.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.sde.base import SDE
from xdiffusion_tpu.utils import broadcast_from_left


class subVPSDE(SDE):
    def __init__(self, beta_min: float = 0.1, beta_max: float = 20.0,
                 N: int = 1000, **kwargs):
        super().__init__(N=N, T=1.0)
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)
        betas = np.linspace(beta_min / N, beta_max / N, N, dtype=np.float64)
        self.discrete_betas = jnp.asarray(betas, jnp.float32)
        self.alphas = jnp.asarray(1.0 - betas, jnp.float32)

    def sde(self, x: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = -0.5 * broadcast_from_left(beta_t, x.shape) * x
        discount = 1.0 - jnp.exp(
            -2.0 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t**2
        )
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x: jax.Array, t: jax.Array):
        log_mean_coeff = (
            -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        )
        mean = broadcast_from_left(jnp.exp(log_mean_coeff), x.shape) * x
        std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
        return mean, std

    def prior_sampling(self, rng: jax.Array, shape) -> jax.Array:
        return jax.random.normal(rng, shape)

    def prior_logp(self, z: jax.Array) -> jax.Array:
        n = np.prod(z.shape[1:])
        return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(
            z.reshape(z.shape[0], -1) ** 2, axis=-1
        ) / 2.0
