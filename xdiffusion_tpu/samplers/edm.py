"""EDM samplers (Karras Algorithm 2 family) as single-scan programs.

Behavioral counterpart of the reference EDM samplers
(/root/reference/xdiffusion/samplers/edm.py:10-414). All schedule math —
sigma discretizations (vp/ve/iddpm/edm), schedules, scalings, churn
gammas — is pure scalar functions of the step index, so it precomputes in
float64 numpy on the host and becomes per-step arrays scanned on-device.
Per step the program does one (Euler) or two (Heun) network evaluations
and nothing else; the Heun correction is a `jnp.where` on a last-step
flag so the loop stays branch-free.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.samplers.base import ReverseProcessSampler


class StochasticSampler(ReverseProcessSampler):
    """EDM Algorithm 2: rho-spaced sigmas, optional churn, Heun correction
    (reference: samplers/edm.py:10-136)."""

    def __init__(
        self,
        num_steps: int = 18,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        S_churn: float = 0.0,
        S_min: float = 0.0,
        S_max: float = float("inf"),
        S_noise: float = 1.0,
        **kwargs,
    ):
        self.num_steps = int(num_steps)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.rho = float(rho)
        self.S_churn = float(S_churn)
        self.S_min = float(S_min)
        self.S_max = float(S_max)
        self.S_noise = float(S_noise)

    def _t_steps(self, net) -> np.ndarray:
        sigma_min = max(self.sigma_min, net.sigma_min)
        sigma_max = min(self.sigma_max, net.sigma_max)
        i = np.arange(self.num_steps, dtype=np.float64)
        t = (
            sigma_max ** (1 / self.rho)
            + i / (self.num_steps - 1)
            * (sigma_min ** (1 / self.rho) - sigma_max ** (1 / self.rho))
        ) ** self.rho
        return np.concatenate([t, [0.0]])

    def build_sample_loop(self, process, shape) -> Callable:
        net = process.score_network()
        t_steps = self._t_steps(net)
        n = self.num_steps

        # Per-step host-precomputed scalars.
        t_cur = t_steps[:-1]
        t_next = t_steps[1:]
        gamma = np.where(
            (self.S_min <= t_cur) & (t_cur <= self.S_max),
            min(self.S_churn / n, math.sqrt(2.0) - 1.0),
            0.0,
        )
        t_hat = t_cur + gamma * t_cur
        noise_coef = np.sqrt(np.maximum(t_hat**2 - t_cur**2, 0.0)) * self.S_noise
        second_order = (np.arange(n) < n - 1).astype(np.float32)

        steps = {
            "t_hat": jnp.asarray(t_hat, jnp.float32),
            "t_next": jnp.asarray(t_next, jnp.float32),
            "noise_coef": jnp.asarray(noise_coef, jnp.float32),
            "second_order": jnp.asarray(second_order),
        }
        t0 = float(t_steps[0])

        def sample_fn(params, rng, latents, class_labels=None):
            x0 = latents * t0

            def body(carry, per):
                x_cur, key = carry
                key, nk = jax.random.split(key)
                eps = jax.random.normal(nk, x_cur.shape, dtype=x_cur.dtype)
                x_hat = x_cur + per["noise_coef"] * eps
                t_hat = per["t_hat"]
                t_nxt = per["t_next"]

                denoised = net.apply(params, x_hat, t_hat, class_labels)
                d_cur = (x_hat - denoised) / t_hat
                x_euler = x_hat + (t_nxt - t_hat) * d_cur

                # Heun correction (skipped on the final step where t_next=0).
                t_safe = jnp.where(t_nxt > 0, t_nxt, 1.0)
                denoised2 = net.apply(params, x_euler, t_safe, class_labels)
                d_prime = (x_euler - denoised2) / t_safe
                x_heun = x_hat + (t_nxt - t_hat) * 0.5 * (d_cur + d_prime)
                x_next = jnp.where(per["second_order"] > 0, x_heun, x_euler)
                return (x_next, key), None

            (x, _), _ = jax.lax.scan(body, (x0, rng), steps)
            return x

        return sample_fn


class GeneralizedStochasticSampler(ReverseProcessSampler):
    """All design points of the EDM paper: discretization in
    {vp, ve, iddpm, edm} x schedule {vp, ve, linear} x scaling {vp, none}
    x solver {euler, heun} with churn (reference: samplers/edm.py:139-414).
    """

    def __init__(
        self,
        num_steps: int = 18,
        sigma_min: Optional[float] = None,
        sigma_max: Optional[float] = None,
        rho: float = 7.0,
        S_churn: float = 0.0,
        S_min: float = 0.0,
        S_max: float = float("inf"),
        S_noise: float = 1.0,
        solver: str = "euler",
        discretization: str = "vp",
        schedule: str = "vp",
        scaling: str = "vp",
        epsilon_s: float = 1e-3,
        C_1: float = 0.001,
        C_2: float = 0.008,
        M: int = 1000,
        alpha: float = 1.0,
        **kwargs,
    ):
        assert solver in ("euler", "heun")
        assert discretization in ("vp", "ve", "iddpm", "edm")
        assert schedule in ("vp", "ve", "linear")
        assert scaling in ("vp", "none")
        self.num_steps = int(num_steps)
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.rho = float(rho)
        self.S_churn = float(S_churn)
        self.S_min = float(S_min)
        self.S_max = float(S_max)
        self.S_noise = float(S_noise)
        self.solver = solver
        self.discretization = discretization
        self.schedule = schedule
        self.scaling = scaling
        self.epsilon_s = float(epsilon_s)
        self.C_1 = float(C_1)
        self.C_2 = float(C_2)
        self.M = int(M)
        self.alpha = float(alpha)

    def build_sample_loop(self, process, shape) -> Callable:
        net = process.score_network()
        n = self.num_steps

        # ---- schedule helper functions (float64 numpy) -------------------
        vp_sigma = lambda bd, bm: lambda t: np.sqrt(
            np.exp(0.5 * bd * t**2 + bm * t) - 1.0
        )
        vp_sigma_deriv = lambda bd, bm, sig: lambda t: 0.5 * (bm + bd * t) * (
            sig(t) + 1.0 / sig(t)
        )
        vp_sigma_inv = lambda bd, bm: lambda s: (
            np.sqrt(bm**2 + 2 * bd * np.log(s**2 + 1.0)) - bm
        ) / bd
        ve_sigma = lambda t: np.sqrt(t)
        ve_sigma_deriv = lambda t: 0.5 / np.sqrt(t)
        ve_sigma_inv = lambda s: s**2

        sigma_min = self.sigma_min
        sigma_max = self.sigma_max
        if sigma_min is None:
            vp_def = vp_sigma(19.9, 0.1)(self.epsilon_s)
            sigma_min = {
                "vp": vp_def, "ve": 0.02, "iddpm": 0.002, "edm": 0.002
            }[self.discretization]
        if sigma_max is None:
            vp_def = vp_sigma(19.9, 0.1)(1.0)
            sigma_max = {
                "vp": vp_def, "ve": 100.0, "iddpm": 81.0, "edm": 80.0
            }[self.discretization]
        sigma_min = max(sigma_min, net.sigma_min)
        sigma_max = min(sigma_max, net.sigma_max)

        vp_beta_d = (
            2
            * (
                np.log(sigma_min**2 + 1.0) / self.epsilon_s
                - np.log(sigma_max**2 + 1.0)
            )
            / (self.epsilon_s - 1.0)
        )
        vp_beta_min = np.log(sigma_max**2 + 1.0) - 0.5 * vp_beta_d

        idx = np.arange(n, dtype=np.float64)
        if self.discretization == "vp":
            orig_t = 1.0 + idx / (n - 1) * (self.epsilon_s - 1.0)
            sigma_steps = vp_sigma(vp_beta_d, vp_beta_min)(orig_t)
        elif self.discretization == "ve":
            orig_t = (sigma_max**2) * (
                (sigma_min**2 / sigma_max**2) ** (idx / (n - 1))
            )
            sigma_steps = ve_sigma(orig_t)
        elif self.discretization == "iddpm":
            u = np.zeros(self.M + 1, dtype=np.float64)
            alpha_bar = lambda j: np.sin(
                0.5 * np.pi * j / (self.M * (self.C_2 + 1))
            ) ** 2
            for j in range(self.M, 0, -1):
                u[j - 1] = np.sqrt(
                    (u[j] ** 2 + 1.0)
                    / max(alpha_bar(j - 1) / alpha_bar(j), self.C_1)
                    - 1.0
                )
            u_filtered = u[(u >= sigma_min) & (u <= sigma_max)]
            sel = np.round(
                (len(u_filtered) - 1) / (n - 1) * idx
            ).astype(np.int64)
            sigma_steps = u_filtered[sel]
        else:  # edm
            sigma_steps = (
                sigma_max ** (1 / self.rho)
                + idx / (n - 1)
                * (sigma_min ** (1 / self.rho) - sigma_max ** (1 / self.rho))
            ) ** self.rho

        if self.schedule == "vp":
            sigma = vp_sigma(vp_beta_d, vp_beta_min)
            sigma_deriv = vp_sigma_deriv(vp_beta_d, vp_beta_min, sigma)
            sigma_inv = vp_sigma_inv(vp_beta_d, vp_beta_min)
        elif self.schedule == "ve":
            sigma, sigma_deriv, sigma_inv = ve_sigma, ve_sigma_deriv, ve_sigma_inv
        else:
            sigma = lambda t: t
            sigma_deriv = lambda t: np.ones_like(np.asarray(t, dtype=np.float64))
            sigma_inv = lambda s: s

        if self.scaling == "vp":
            s_fn = lambda t: 1.0 / np.sqrt(1.0 + sigma(t) ** 2)
            s_deriv = lambda t: -sigma(t) * sigma_deriv(t) * (s_fn(t) ** 3)
        else:
            s_fn = lambda t: np.ones_like(np.asarray(t, dtype=np.float64))
            s_deriv = lambda t: np.zeros_like(np.asarray(t, dtype=np.float64))

        t_steps = sigma_inv(np.asarray(jax.device_get(net.round_sigma(sigma_steps))))
        t_steps = np.concatenate([t_steps, [0.0]])

        # ---- per-step scalar tables --------------------------------------
        t_cur = t_steps[:-1]
        t_next = t_steps[1:]
        gamma = np.where(
            (self.S_min <= sigma(t_cur)) & (sigma(t_cur) <= self.S_max),
            min(self.S_churn / n, math.sqrt(2.0) - 1.0),
            0.0,
        )
        sig_hat_target = sigma(t_cur) + gamma * sigma(t_cur)
        t_hat = sigma_inv(np.asarray(jax.device_get(net.round_sigma(sig_hat_target))))

        def safe(v):
            return np.where(np.abs(v) < 1e-20, 1e-20, v)

        tables = {
            "ratio": s_fn(t_hat) / s_fn(t_cur),
            "noise_coef": np.sqrt(
                np.clip(sigma(t_hat) ** 2 - sigma(t_cur) ** 2, 0.0, None)
            )
            * s_fn(t_hat)
            * self.S_noise,
            "h": t_next - t_hat,
            "sigma_hat": sigma(t_hat),
            "s_hat": s_fn(t_hat),
            "A_hat": sigma_deriv(t_hat) / safe(sigma(t_hat))
            + s_deriv(t_hat) / safe(s_fn(t_hat)),
            "B_hat": sigma_deriv(t_hat) * s_fn(t_hat) / safe(sigma(t_hat)),
        }
        t_prime = t_hat + self.alpha * (t_next - t_hat)
        tables.update(
            {
                "sigma_prime": safe(sigma(t_prime)),
                "s_prime": safe(s_fn(t_prime)),
                "A_prime": sigma_deriv(t_prime) / safe(sigma(t_prime))
                + s_deriv(t_prime) / safe(s_fn(t_prime)),
                "B_prime": sigma_deriv(t_prime)
                * s_fn(t_prime)
                / safe(sigma(t_prime)),
                "second_order": (
                    (np.arange(n) < n - 1) & (self.solver == "heun")
                ).astype(np.float64),
            }
        )
        steps = {k: jnp.asarray(v, jnp.float32) for k, v in tables.items()}
        x0_scale = float(sigma(t_steps[0]) * s_fn(t_steps[0]))
        alpha = self.alpha

        is_heun = self.solver == "heun"  # static: euler bodies skip eval 2

        def sample_fn(params, rng, latents, class_labels=None):
            x0 = latents * x0_scale

            def body(carry, per):
                x_cur, key = carry
                key, nk = jax.random.split(key)
                eps = jax.random.normal(nk, x_cur.shape, dtype=x_cur.dtype)
                x_hat = per["ratio"] * x_cur + per["noise_coef"] * eps

                den = net.apply(
                    params, x_hat / per["s_hat"], per["sigma_hat"], class_labels
                )
                d_cur = per["A_hat"] * x_hat - per["B_hat"] * den
                x_euler = x_hat + per["h"] * d_cur
                if not is_heun:
                    return (x_euler, key), None

                x_prime = x_hat + alpha * per["h"] * d_cur
                den2 = net.apply(
                    params,
                    x_prime / per["s_prime"],
                    per["sigma_prime"],
                    class_labels,
                )
                d_prime = per["A_prime"] * x_prime - per["B_prime"] * den2
                x_heun = x_hat + per["h"] * (
                    (1.0 - 1.0 / (2.0 * alpha)) * d_cur
                    + (1.0 / (2.0 * alpha)) * d_prime
                )
                x_next = jnp.where(per["second_order"] > 0, x_heun, x_euler)
                return (x_next, key), None

            (x, _), _ = jax.lax.scan(body, (x0, rng), steps)
            return x

        return sample_fn
