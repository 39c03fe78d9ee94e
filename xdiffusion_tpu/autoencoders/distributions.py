"""Diagonal gaussian posterior (reference: autoencoders/distributions.py:10-60).

Channel-last convention: moments are (..., 2*C) and split on the trailing
axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class DiagonalGaussianDistribution:
    def __init__(self, parameters: jax.Array, deterministic: bool = False):
        self.parameters = parameters
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.std = jnp.zeros_like(self.mean)
            self.var = jnp.zeros_like(self.mean)

    def sample(self, rng: jax.Array) -> jax.Array:
        noise = jax.random.normal(rng, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None):
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],))
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        if self.deterministic:
            return jnp.zeros((sample.shape[0],))
        axes = tuple(range(1, sample.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=axes,
        )
