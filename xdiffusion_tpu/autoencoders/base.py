"""VariationalAutoEncoder protocol (reference: autoencoders/base.py:5-13).

JAX recast: autoencoders are linen modules plus a thin wrapper holding the
module; encode/decode are pure functions of (params, x).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax


class VariationalAutoEncoder(ABC):
    @abstractmethod
    def encode_to_latents(self, params, x: jax.Array, rng: jax.Array) -> jax.Array:
        """Images [0,1] -> latent samples."""

    @abstractmethod
    def decode_from_latents(self, params, z: jax.Array, **kwargs) -> jax.Array:
        """Latents -> decoded images."""
