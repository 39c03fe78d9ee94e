"""Predictor-Corrector samplers (Score-SDE) as scan step functions.

Behavioral counterpart of /root/reference/xdiffusion/samplers/pc.py:66-205:
per step, run n corrector (Langevin) updates then one predictor update
(ancestral / Euler-Maruyama / reverse-diffusion); the final step returns
the noise-free mean. Predictors work on the reverse SDE
dx = [f - g^2 * score] dt + g dW constructed inline (the reference's
dynamically-built RSDE subclass does not map onto traced programs).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from xdiffusion_tpu.config import instantiate_partial_from_config
from xdiffusion_tpu.utils import broadcast_from_left


class Predictor:
    def __init__(self, sde, score_fn: Callable, probability_flow: bool = False):
        self.sde = sde
        self.score_fn = score_fn
        self.probability_flow = probability_flow

    def update(self, rng, x, t) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError


class AncestralSamplingPredictor(Predictor):
    """DDPM ancestral update in score form (VP SDEs only)."""

    def update(self, rng, x, t):
        sde = self.sde
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        beta = broadcast_from_left(
            jnp.take(sde.discrete_betas, timestep), x.shape
        )
        score = self.score_fn(x, t)
        x_mean = (x + beta * score) / jnp.sqrt(1.0 - beta)
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        return x_mean + jnp.sqrt(beta) * noise, x_mean


class EulerMaruyamaPredictor(Predictor):
    def update(self, rng, x, t):
        sde = self.sde
        dt = -sde.T / sde.N
        drift, diffusion = sde.sde(x, t)
        score = self.score_fn(x, t)
        g2 = broadcast_from_left(diffusion**2, x.shape)
        coef = 0.5 if self.probability_flow else 1.0
        rev_drift = drift - g2 * score * coef
        x_mean = x + rev_drift * dt
        if self.probability_flow:
            return x_mean, x_mean
        z = jax.random.normal(rng, x.shape, dtype=x.dtype)
        x_next = x_mean + broadcast_from_left(diffusion, x.shape) * jnp.sqrt(
            -dt
        ) * z
        return x_next, x_mean


class ReverseDiffusionPredictor(Predictor):
    def update(self, rng, x, t):
        f, g = self.sde.discretize(x, t)
        score = self.score_fn(x, t)
        g_b = broadcast_from_left(g, x.shape)
        coef = 0.5 if self.probability_flow else 1.0
        f_rev = f - g_b**2 * score * coef
        x_mean = x - f_rev
        if self.probability_flow:
            return x_mean, x_mean
        z = jax.random.normal(rng, x.shape, dtype=x.dtype)
        return x_mean + g_b * z, x_mean


class LangevinCorrector:
    def __init__(self, sde, score_fn: Callable, snr: float = 0.16,
                 n_steps: int = 1):
        self.sde = sde
        self.score_fn = score_fn
        self.snr = float(snr)
        self.n_steps = int(n_steps)

    def update(self, rng, x, t):
        sde = self.sde
        if hasattr(sde, "alphas"):
            timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
            alpha = jnp.take(sde.alphas, timestep)
        else:
            alpha = jnp.ones_like(t)

        x_mean = x
        for i in range(self.n_steps):
            rng, step_rng = jax.random.split(rng)
            grad = self.score_fn(x, t)
            noise = jax.random.normal(step_rng, x.shape, dtype=x.dtype)
            grad_norm = jnp.linalg.norm(
                grad.reshape(grad.shape[0], -1), axis=-1
            ).mean()
            noise_norm = jnp.linalg.norm(
                noise.reshape(noise.shape[0], -1), axis=-1
            ).mean()
            step_size = (self.snr * noise_norm / grad_norm) ** 2 * 2.0 * alpha
            ss = broadcast_from_left(step_size, x.shape)
            x_mean = x + ss * grad
            x = x_mean + jnp.sqrt(ss * 2.0) * noise
        return x, x_mean


class NoneCorrector:
    def __init__(self, **kwargs):
        pass

    def update(self, rng, x, t):
        return x, x


class PredictorCorrectorSampler:
    """Config-driven PC sampler; builds a per-step update from the
    predictor/corrector sub-configs (reference: pc.py:66-103)."""

    def __init__(self, predictor: Dict, corrector: Dict, **kwargs):
        self._predictor_cfg = predictor
        self._corrector_cfg = corrector

    def build(self, sde, score_fn):
        if isinstance(self._predictor_cfg, dict):
            pred_cfg, corr_cfg = self._predictor_cfg, self._corrector_cfg
        else:  # DotConfig
            pred_cfg = self._predictor_cfg.to_dict()
            corr_cfg = self._corrector_cfg.to_dict()
        predictor = instantiate_partial_from_config(pred_cfg)(
            sde=sde, score_fn=score_fn
        )
        corrector = instantiate_partial_from_config(corr_cfg)(
            sde=sde, score_fn=score_fn
        )

        def step(rng, x, t, denoise_final):
            rng_c, rng_p = jax.random.split(rng)
            x, _ = corrector.update(rng_c, x, t)
            x, x_mean = predictor.update(rng_p, x, t)
            return jnp.where(denoise_final, x_mean, x)

        return step
