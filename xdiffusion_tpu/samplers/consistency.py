"""Consistency-model samplers: one-step and multistep (stochastic
iterative), plus the Karras sigma helpers.

Behavioral counterpart of /root/reference/xdiffusion/samplers/
consistency.py:11-448: one-step sampling evaluates the consistency
function once at sigma_max; multistep alternates denoise -> renoise at a
configured subsequence of the rho-spaced sigma ladder.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def get_sigmas_karras(
    n: int, sigma_min: float, sigma_max: float, rho: float = 7.0
) -> np.ndarray:
    """rho-spaced noise ladder, descending, with a trailing 0."""
    ramp = np.linspace(0, 1, n)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.concatenate([sigmas, [0.0]])


class OneStepConsistencySampler:
    """x0 = f(x_T * sigma_max, sigma_max) (reference: consistency.py:11-85)."""

    def __init__(
        self,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        clip_denoised: bool = True,
        **kwargs,
    ):
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.rho = float(rho)
        self.clip_denoised = bool(clip_denoised)

    def build_sample_loop(self, process, shape) -> Callable:
        net = process.score_network()
        sigma_max = min(self.sigma_max, net.sigma_max)
        clip = self.clip_denoised

        def sample_fn(params, rng, latents, class_labels=None):
            x = latents * sigma_max
            sigma = jnp.full((shape[0],), sigma_max, dtype=jnp.float32)
            x0 = net.apply(params, x, sigma, class_labels=class_labels)
            if clip:
                x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        return sample_fn


class GeneralizedConsistencySampler:
    """Multistep stochastic-iterative sampling
    (reference: consistency.py:87-215, 380-402): at each configured index,
    denoise with the consistency function then re-noise to the next sigma.
    """

    def __init__(
        self,
        steps: int = 40,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        clip_denoised: bool = True,
        sampler: str = "multistep",
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        s_noise: float = 1.0,
        multistep: Optional[Sequence[int]] = None,
        **kwargs,
    ):
        self.steps = int(steps)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.rho = float(rho)
        self.clip_denoised = bool(clip_denoised)
        self.sampler = sampler
        self.multistep_ts = list(multistep) if multistep else [0, self.steps // 2]

    def build_sample_loop(self, process, shape) -> Callable:
        net = process.score_network()
        sigma_min = max(self.sigma_min, net.sigma_min)
        sigma_max = min(self.sigma_max, net.sigma_max)
        rho = self.rho
        steps = self.steps
        clip = self.clip_denoised

        t_max_rho = sigma_max ** (1 / rho)
        t_min_rho = sigma_min ** (1 / rho)
        ts = np.asarray(self.multistep_ts, dtype=np.float64)
        t_cur = (t_max_rho + ts[:-1] / (steps - 1) * (t_min_rho - t_max_rho)) ** rho
        t_next = (t_max_rho + ts[1:] / (steps - 1) * (t_min_rho - t_max_rho)) ** rho
        t_next = np.clip(t_next, sigma_min, sigma_max)
        noise_coef = np.sqrt(np.maximum(t_next**2 - sigma_min**2, 0.0))
        per_step = {
            "t": jnp.asarray(t_cur, jnp.float32),
            "noise_coef": jnp.asarray(noise_coef, jnp.float32),
        }

        def sample_fn(params, rng, latents, class_labels=None):
            x = latents * sigma_max

            def denoise(x, t):
                x0 = net.apply(
                    params,
                    x,
                    jnp.full((shape[0],), t, dtype=jnp.float32),
                    class_labels=class_labels,
                )
                return jnp.clip(x0, -1.0, 1.0) if clip else x0

            def body(carry, per):
                x, key = carry
                key, nk = jax.random.split(key)
                x0 = denoise(x, per["t"])
                noise = jax.random.normal(nk, x.shape, dtype=x.dtype)
                x = x0 + per["noise_coef"] * noise
                return (x, key), None

            (x, _), _ = jax.lax.scan(body, (x, rng), per_step)
            # Final denoise at the last boundary sigma.
            x0 = denoise(x, float(np.clip(
                (t_max_rho + ts[-1] / (steps - 1) * (t_min_rho - t_max_rho)) ** rho,
                sigma_min, sigma_max,
            )))
            return x0

        return sample_fn
