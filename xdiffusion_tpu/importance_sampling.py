"""Timestep schedule samplers (uniform + loss-aware importance sampling).

Behavioral equivalent of /root/reference/xdiffusion/importance_sampling.py.

Split by execution domain, which is the TPU-native design point:

- `UniformSampler` is pure and device-side: it draws timesteps inside the
  jitted train step from the step rng (no host round-trip).
- `ImportanceSampler` (Improved-DDPM loss-history sampling) is stateful
  across steps. Its state (per-timestep loss history + counts) is a small
  pytree that lives ON DEVICE inside the TrainState: timestep sampling,
  weight computation, and the rolling history update all run inside the
  jitted train step — zero host round-trips. The host-side
  sample()/update_with_all_losses() path is kept for reference-parity
  testing and non-jitted callers.
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

    # -- device-side path (runs inside the jitted train step) ---------------

    @property
    def device_side(self) -> bool:
        return True

    def init_device_state(self):
        """Loss-history state pytree carried in the TrainState."""
        return {
            "loss_history": jnp.zeros(
                (self.num_timesteps, self.history_per_term), jnp.float32
            ),
            "loss_counts": jnp.zeros((self.num_timesteps,), jnp.int32),
        }

    def device_weights(self, state) -> jax.Array:
        """Normalized sampling distribution; uniform until warmed up."""
        n = self.num_timesteps
        warmed = jnp.all(state["loss_counts"] == self.history_per_term)
        w = jnp.sqrt(jnp.mean(state["loss_history"] ** 2, axis=-1))
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        w = w * (1.0 - self.uniform_prob) + self.uniform_prob / n
        return jnp.where(warmed, w, jnp.full((n,), 1.0 / n))

    def device_sample(
        self, rng: jax.Array, batch_size: int, state
    ) -> Tuple[jax.Array, jax.Array]:
        """(timesteps, importance weights) drawn inside the traced step."""
        p = self.device_weights(state)
        t = jax.random.choice(rng, self.num_timesteps, (batch_size,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t.astype(jnp.int32), weights.astype(jnp.float32)

    def device_update(self, state, ts: jax.Array, losses: jax.Array):
        """Rolling per-timestep history update. Batch entries are applied
        sequentially (a scan of tiny scatters) so duplicate timesteps
        within a batch stack exactly like the host implementation."""
        h = self.history_per_term

        def body(st, tl):
            t, loss = tl
            row = st["loss_history"][t]
            cnt = st["loss_counts"][t]
            full = cnt == h
            shifted = jnp.concatenate([row[1:], loss[None]])
            appended = row.at[jnp.minimum(cnt, h - 1)].set(loss)
            new_row = jnp.where(full, shifted, appended)
            return {
                "loss_history": st["loss_history"].at[t].set(new_row),
                "loss_counts": st["loss_counts"]
                .at[t]
                .set(jnp.where(full, cnt, cnt + 1)),
            }, None

        state, _ = jax.lax.scan(
            body, state, (ts.astype(jnp.int32), losses.astype(jnp.float32))
        )
        return state
