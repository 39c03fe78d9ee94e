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
    """The Karras/consistency sampler family as scan programs.

    Behavioral counterpart of the reference dispatch
    (/root/reference/xdiffusion/samplers/consistency.py:87-446):
    `sampler` selects heun | dpm | ancestral | euler | progdist | onestep |
    multistep. All schedule math (sigma ladders, churn factors, ancestral
    step sizes, DPM midpoints) is precomputed in fp64 numpy and fed to a
    single `lax.scan` as per-step tables — zero host round-trips per step.
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
        self.s_churn = float(s_churn)
        self.s_tmin = float(s_tmin)
        self.s_tmax = float(s_tmax)
        self.s_noise = float(s_noise)
        self.multistep_ts = list(multistep) if multistep else [0, self.steps // 2]

    # -- schedule precomputation (numpy fp64) --------------------------------

    def _gammas(self, sigmas: np.ndarray) -> np.ndarray:
        """Per-step churn factor (reference consistency.py:280-284)."""
        n = len(sigmas) - 1
        gam = np.zeros(n)
        for i in range(n):
            if self.s_tmin <= sigmas[i] <= self.s_tmax:
                gam[i] = min(self.s_churn / n, 2**0.5 - 1)
        return gam

    def build_sample_loop(self, process, shape) -> Callable:
        net = process.score_network()
        sigma_min = max(self.sigma_min, net.sigma_min)
        sigma_max = min(self.sigma_max, net.sigma_max)
        rho = self.rho
        steps = self.steps
        clip = self.clip_denoised
        s_noise = self.s_noise
        kind = self.sampler

        def make_denoise(params, class_labels):
            def denoise(x, t_vec):
                x0 = net.apply(params, x, t_vec, class_labels=class_labels)
                return jnp.clip(x0, -1.0, 1.0) if clip else x0

            return denoise

        def full(t):
            return jnp.full((shape[0],), t, dtype=jnp.float32)

        if kind == "onestep":
            def sample_fn(params, rng, latents, class_labels=None):
                denoise = make_denoise(params, class_labels)
                x0 = denoise(latents * sigma_max, full(sigma_max))
                return jnp.clip(x0, -1.0, 1.0)

            return sample_fn

        if kind == "multistep":
            return self._multistep_loop(
                net, shape, sigma_min, sigma_max, rho, steps, clip
            )

        ladder_n = steps + 1 if kind == "progdist" else steps
        sigmas = get_sigmas_karras(ladder_n, sigma_min, sigma_max, rho)
        if kind == "progdist":
            sigmas = sigmas[:-1]  # drop the zero (reference :413)

        if kind in ("euler", "progdist"):
            per = {
                "sigma": jnp.asarray(sigmas[:-1], jnp.float32),
                "dt": jnp.asarray(np.diff(sigmas), jnp.float32),
            }

            def sample_fn(params, rng, latents, class_labels=None):
                denoise = make_denoise(params, class_labels)

                def body(x, p):
                    den = denoise(x, full(1.0) * p["sigma"])
                    d = (x - den) / p["sigma"]
                    return x + d * p["dt"], None

                x, _ = jax.lax.scan(body, latents * sigma_max, per)
                return jnp.clip(x, -1.0, 1.0)

            return sample_fn

        if kind == "ancestral":
            s_from, s_to = sigmas[:-1], sigmas[1:]
            sigma_up = np.sqrt(
                np.maximum(s_to**2 * (s_from**2 - s_to**2) / s_from**2, 0.0)
            )
            sigma_down = np.sqrt(np.maximum(s_to**2 - sigma_up**2, 0.0))
            per = {
                "sigma": jnp.asarray(s_from, jnp.float32),
                "dt": jnp.asarray(sigma_down - s_from, jnp.float32),
                "up": jnp.asarray(sigma_up, jnp.float32),
            }

            def sample_fn(params, rng, latents, class_labels=None):
                denoise = make_denoise(params, class_labels)

                def body(carry, p):
                    x, key = carry
                    key, nk = jax.random.split(key)
                    den = denoise(x, full(1.0) * p["sigma"])
                    d = (x - den) / p["sigma"]
                    x = x + d * p["dt"]
                    x = x + jax.random.normal(nk, x.shape, x.dtype) * p["up"]
                    return (x, key), None

                (x, _), _ = jax.lax.scan(body, (latents * sigma_max, rng), per)
                return jnp.clip(x, -1.0, 1.0)

            return sample_fn

        if kind == "heun":
            gam = self._gammas(sigmas)
            sigma_hat = sigmas[:-1] * (gam + 1)
            churn = np.sqrt(np.maximum(sigma_hat**2 - sigmas[:-1] ** 2, 0.0))
            # Scan covers steps whose target sigma > 0; the final step to
            # sigma=0 is a plain Euler step (reference :292-294) == the
            # denoised value, applied after the scan.
            per = {
                "sigma_hat": jnp.asarray(sigma_hat[:-1], jnp.float32),
                "churn": jnp.asarray(churn[:-1], jnp.float32),
                "sigma_next": jnp.asarray(sigmas[1:-1], jnp.float32),
            }
            last_hat = float(sigma_hat[-1])
            last_churn = float(churn[-1])

            def sample_fn(params, rng, latents, class_labels=None):
                denoise = make_denoise(params, class_labels)

                def body(carry, p):
                    x, key = carry
                    key, nk = jax.random.split(key)
                    eps = jax.random.normal(nk, x.shape, x.dtype) * s_noise
                    x = x + eps * p["churn"]
                    den = denoise(x, full(1.0) * p["sigma_hat"])
                    d = (x - den) / p["sigma_hat"]
                    dt = p["sigma_next"] - p["sigma_hat"]
                    x_2 = x + d * dt
                    den_2 = denoise(x_2, full(1.0) * p["sigma_next"])
                    d_2 = (x_2 - den_2) / p["sigma_next"]
                    x = x + (d + d_2) / 2 * dt
                    return (x, key), None

                (x, key), _ = jax.lax.scan(body, (latents * sigma_max, rng), per)
                _, nk = jax.random.split(key)
                eps = jax.random.normal(nk, x.shape, x.dtype) * s_noise
                x = x + eps * last_churn
                x = denoise(x, full(last_hat))
                return jnp.clip(x, -1.0, 1.0)

            return sample_fn

        if kind == "dpm":
            gam = self._gammas(sigmas)
            s_cur, s_next = sigmas[:-1], sigmas[1:]
            sigma_hat = s_cur * (gam + 1)
            churn = np.sqrt(np.maximum(sigma_hat**2 - s_cur**2, 0.0))
            # Midpoint on a rho=3 Karras interpolation (reference :356).
            sigma_mid = ((sigma_hat ** (1 / 3) + s_next ** (1 / 3)) / 2) ** 3
            per = {
                "sigma_hat": jnp.asarray(sigma_hat, jnp.float32),
                "churn": jnp.asarray(churn, jnp.float32),
                "sigma_mid": jnp.asarray(sigma_mid, jnp.float32),
                "dt_1": jnp.asarray(sigma_mid - sigma_hat, jnp.float32),
                "dt_2": jnp.asarray(s_next - sigma_hat, jnp.float32),
            }

            def sample_fn(params, rng, latents, class_labels=None):
                denoise = make_denoise(params, class_labels)

                def body(carry, p):
                    x, key = carry
                    key, nk = jax.random.split(key)
                    eps = jax.random.normal(nk, x.shape, x.dtype) * s_noise
                    x = x + eps * p["churn"]
                    den = denoise(x, full(1.0) * p["sigma_hat"])
                    d = (x - den) / p["sigma_hat"]
                    x_2 = x + d * p["dt_1"]
                    den_2 = denoise(x_2, full(1.0) * p["sigma_mid"])
                    d_2 = (x_2 - den_2) / p["sigma_mid"]
                    x = x + d_2 * p["dt_2"]
                    return (x, key), None

                (x, _), _ = jax.lax.scan(body, (latents * sigma_max, rng), per)
                return jnp.clip(x, -1.0, 1.0)

            return sample_fn

        raise ValueError(f"unknown consistency sampler '{kind}'")

    def _multistep_loop(self, net, shape, sigma_min, sigma_max, rho, steps, clip):
        """Stochastic-iterative multistep (reference consistency.py:380-402)."""
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
