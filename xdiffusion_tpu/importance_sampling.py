"""Timestep schedule samplers (uniform + loss-aware importance sampling).

Behavioral equivalent of /root/reference/xdiffusion/importance_sampling.py.

Split by execution domain, which is the TPU-native design point:

- `UniformSampler` is pure and device-side: it draws timesteps inside the
  jitted train step from the step rng (no host round-trip).
- `ImportanceSampler` (Improved-DDPM loss-history sampling) is inherently
  stateful across steps, so it lives on the host: the train loop asks it for
  (t, weights) numpy arrays which are fed in with the batch, and feeds the
  returned per-example losses back into its history. This costs one tiny
  (B,) transfer per step and keeps the jitted program pure.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ScheduleSampler(ABC):
    """Interface for training-time timestep distribution samplers."""

    @abstractmethod
    def weights(self) -> np.ndarray:
        """Unnormalized positive sampling weight per diffusion step."""

    def update_with_all_losses(self, ts: np.ndarray, losses: np.ndarray) -> None:
        """Feed back per-timestep losses (no-op unless loss-aware)."""

    @property
    def device_side(self) -> bool:
        """True if sampling can run inside the jitted step."""
        return False

    def sample(self, batch_size: int, rng: Optional[np.random.Generator] = None):
        """Host-side importance sampling returning (timesteps, weights)."""
        rng = rng or np.random.default_rng()
        w = self.weights()
        p = w / np.sum(w)
        indices = rng.choice(len(p), size=(batch_size,), p=p)
        weights = 1.0 / (len(p) * p[indices])
        return indices.astype(np.int32), weights.astype(np.float32)


class UniformSampler(ScheduleSampler):
    """Uniform timesteps with unit weights; device-side."""

    def __init__(self, num_timesteps: int):
        self._num_timesteps = int(num_timesteps)

    def weights(self) -> np.ndarray:
        return np.ones([self._num_timesteps])

    @property
    def device_side(self) -> bool:
        return True

    def sample_device(
        self, rng: jax.Array, batch_size: int
    ) -> Tuple[jax.Array, jax.Array]:
        t = jax.random.randint(rng, (batch_size,), 0, self._num_timesteps)
        return t, jnp.ones((batch_size,), dtype=jnp.float32)


class ImportanceSampler(ScheduleSampler):
    """Loss-second-moment importance sampler (Improved DDPM, Sec. 3.3).

    Keeps a rolling history of `history_per_term` losses per timestep;
    until every timestep has a full history it falls back to uniform.
    """

    def __init__(
        self,
        num_timesteps: int,
        history_per_term: int = 10,
        uniform_prob: float = 0.001,
    ):
        self.num_timesteps = int(num_timesteps)
        self.history_per_term = int(history_per_term)
        self.uniform_prob = float(uniform_prob)
        self._loss_history = np.zeros(
            [self.num_timesteps, self.history_per_term], dtype=np.float64
        )
        self._loss_counts = np.zeros([self.num_timesteps], dtype=np.int64)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones([self.num_timesteps], dtype=np.float64)
        weights = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        weights /= np.sum(weights)
        weights *= 1.0 - self.uniform_prob
        weights += self.uniform_prob / len(weights)
        return weights

    def update_with_all_losses(self, ts, losses) -> None:
        ts = np.asarray(ts)
        losses = np.asarray(losses)
        for t, loss in zip(ts, losses):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())
