"""SDE protocol (reference: /root/reference/xdiffusion/sde/base.py:5-155).

An SDE here is a small stateless object exposing drift/diffusion and
marginal statistics as pure functions. `reverse(score_fn)` constructs the
reverse-time SDE/ODE (Anderson 1982; Score-SDE eq. 6 and 13) as another
such object closing over the score function — a functional counterpart of
the reference's dynamically-built RSDE subclass that traces cleanly
under jit/scan.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


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

    def reverse(
        self, score_fn: Callable, probability_flow: bool = False
    ) -> "ReverseSDE":
        """Reverse-time SDE (or probability-flow ODE when probability_flow).

        score_fn(x, t) -> grad_x log p_t(x). Counterpart of the reference
        reverse() (sde/base.py:98-155)."""
        return ReverseSDE(self, score_fn, probability_flow)


def _bcast(coeff: jax.Array, like: jax.Array) -> jax.Array:
    """Left-align a per-batch coefficient against a data tensor."""
    coeff = jnp.asarray(coeff)
    return coeff.reshape(coeff.shape + (1,) * (like.ndim - coeff.ndim))


class ReverseSDE(SDE):
    """dx = [f(x,t) - g(t)^2 * score(x,t)] dt + g(t) dW-bar running in
    reverse time; the probability-flow ODE halves the score term and
    zeroes the diffusion (Score-SDE eq. 6 / eq. 13)."""

    def __init__(self, forward: SDE, score_fn: Callable, probability_flow: bool):
        super().__init__(N=forward.N, T=forward.T)
        self._forward = forward
        self._score_fn = score_fn
        self.probability_flow = bool(probability_flow)

    def sde(self, x: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        drift, diffusion = self._forward.sde(x, t)
        score = self._score_fn(x, t)
        coeff = 0.5 if self.probability_flow else 1.0
        drift = drift - _bcast(diffusion, x) ** 2 * score * coeff
        if self.probability_flow:
            diffusion = jnp.zeros_like(diffusion)
        return drift, diffusion

    def discretize(self, x: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        f, g = self._forward.discretize(x, t)
        coeff = 0.5 if self.probability_flow else 1.0
        rev_f = f - _bcast(g, x) ** 2 * self._score_fn(x, t) * coeff
        rev_g = jnp.zeros_like(g) if self.probability_flow else g
        return rev_f, rev_g

    def marginal_prob(self, x: jax.Array, t: jax.Array):
        return self._forward.marginal_prob(x, t)

    def prior_logp(self, z: jax.Array) -> jax.Array:
        return self._forward.prior_logp(z)

    def sigma_t(self, t) -> jax.Array:
        return self._forward.sigma_t(t)

    def noise_scale(self) -> float:
        return self._forward.noise_scale()
