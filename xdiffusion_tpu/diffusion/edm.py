"""EDM diffusion process + VP/VE/EDM training losses.

Behavioral counterpart of the reference
(/root/reference/xdiffusion/diffusion/edm.py:30-338): losses sample a
noise level per example (uniform-in-t for VP, log-uniform for VE,
log-normal for EDM), weight the denoising MSE accordingly, and train the
preconditioned network D(y + n, sigma). Sampling delegates to the EDM
samplers' own scan loops (Karras Algorithm 2 family).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from xdiffusion_tpu.config import DotConfig, instantiate_from_config
from xdiffusion_tpu.utils import (
    mean_flat,
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)


class VPLoss:
    """VP (DDPM) loss: sigma(t) with t ~ U(eps_t, 1), weight 1/sigma^2."""

    def __init__(self, beta_d: float = 19.9, beta_min: float = 0.1,
                 epsilon_t: float = 1e-5):
        self.beta_d = float(beta_d)
        self.beta_min = float(beta_min)
        self.epsilon_t = float(epsilon_t)

    def sigma(self, t):
        t = jnp.asarray(t, dtype=jnp.float32)
        return jnp.sqrt(jnp.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0)

    def weight(self, sigma):
        return 1.0 / sigma**2

    def sample_sigma_weight(self, rng, batch):
        u = jax.random.uniform(rng, (batch,))
        sigma = self.sigma(1.0 + u * (self.epsilon_t - 1.0))
        return sigma, self.weight(sigma)


class VELoss:
    """VE (SMLD) loss: log-uniform sigma in [sigma_min, sigma_max]."""

    def __init__(self, sigma_min: float = 0.02, sigma_max: float = 100.0):
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)

    def weight(self, sigma):
        return 1.0 / sigma**2

    def sample_sigma_weight(self, rng, batch):
        u = jax.random.uniform(rng, (batch,))
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** u
        return sigma, self.weight(sigma)


class EDMLoss:
    """EDM loss: log-normal sigma, weight (sigma^2+sd^2)/(sigma*sd)^2."""

    def __init__(self, P_mean: float = -1.2, P_std: float = 1.2,
                 sigma_data: float = 0.5):
        self.P_mean = float(P_mean)
        self.P_std = float(P_std)
        self.sigma_data = float(sigma_data)

    def weight(self, sigma):
        return (sigma**2 + self.sigma_data**2) / (sigma * self.sigma_data) ** 2

    def sample_sigma_weight(self, rng, batch):
        n = jax.random.normal(rng, (batch,))
        sigma = jnp.exp(n * self.P_std + self.P_mean)
        return sigma, self.weight(sigma)


class GaussianDiffusion_EDM:
    """Karras-EDM process over a preconditioned score network."""

    def __init__(self, config: DotConfig):
        self._config = config
        diff = config.diffusion
        # Preconditioner wrapper (functional, owns the backbone module).
        self._net = instantiate_from_config(diff.score_network.to_dict())
        self._loss = instantiate_from_config(diff.loss.to_dict())
        self._sampler = instantiate_from_config(diff.sampling.to_dict())
        self._sample_fn_cache = {}

    # -- protocol ----------------------------------------------------------

    def config(self) -> DotConfig:
        return self._config

    def score_network(self):
        return self._net

    def models(self) -> List:
        return [self]

    # -- params --------------------------------------------------------------

    def init_params(self, rng: jax.Array, batch_size: int = 2):
        data = self._config.data
        x = jnp.zeros(
            (batch_size, data.image_size, data.image_size, data.num_channels)
        )
        sigma = jnp.ones((batch_size,), dtype=jnp.float32)
        return self._net.init(rng, x, sigma)

    # -- training ------------------------------------------------------------

    def loss_on_batch(
        self,
        params,
        rng: jax.Array,
        images: jax.Array,
        context: Dict,
        timesteps=None,
        loss_weights=None,
        sigma=None,
        noise=None,
        deterministic: bool = False,
    ) -> Tuple[jax.Array, Dict]:
        """`sigma` injects the per-example noise levels and `noise` the
        UNIT-normal draw (scaled by sigma inside, matching the reference's
        `torch.randn_like(y) * sigma`, diffusion/edm.py:330-337); both are
        for golden-parity tests, never set by the train loops."""
        b = images.shape[0]
        rng_sigma, rng_noise, rng_drop = jax.random.split(rng, 3)
        y = normalize_to_neg_one_to_one(images)
        labels = context.get("classes")

        if sigma is not None:
            sigma = jnp.asarray(sigma, dtype=jnp.float32)
            weight = self._loss.weight(sigma)
        else:
            sigma, weight = self._loss.sample_sigma_weight(rng_sigma, b)
        sigma_e = sigma.reshape((-1,) + (1,) * (y.ndim - 1))
        unit = (
            jnp.asarray(noise)
            if noise is not None
            else jax.random.normal(rng_noise, y.shape)
        )
        n = unit * sigma_e
        d_yn = self._net.apply(
            params,
            y + n,
            sigma,
            class_labels=labels,
            deterministic=deterministic,
            rng=rng_drop,
        )
        per_example = mean_flat(
            weight.reshape((-1,) + (1,) * (y.ndim - 1)) * (d_yn - y) ** 2
        )
        loss = per_example.mean()
        zeros = jnp.zeros_like(per_example)
        return loss, {
            "loss": loss,
            "mse_loss": loss,
            "vb_loss": zeros.mean(),
            "timesteps": sigma,
            "loss_per_example": jax.lax.stop_gradient(per_example),
        }

    # -- sampling ---------------------------------------------------------------

    def sampling_shape(self, num_samples: int) -> Tuple[int, ...]:
        sampling = self._config.diffusion.sampling
        s = sampling.output_spatial_size
        spatial = [s[0], s[1]] if isinstance(s, list) else [s, s]
        return (num_samples, spatial[0], spatial[1], sampling.output_channels)

    def sample(
        self,
        params,
        rng: jax.Array,
        num_samples: int = 16,
        context: Optional[Dict] = None,
        classifier_free_guidance: Optional[float] = None,
        num_sampling_steps: Optional[int] = None,
        sampler=None,
        initial_noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        sampler = sampler or self._sampler
        shape = self.sampling_shape(num_samples)
        key = (num_samples, id(sampler))
        if key not in self._sample_fn_cache:
            fn = sampler.build_sample_loop(self, shape)
            self._sample_fn_cache[key] = jax.jit(fn)
        class_labels = (context or {}).get("classes")
        rng, init_rng = jax.random.split(rng)
        latents = (
            initial_noise
            if initial_noise is not None
            else jax.random.normal(init_rng, shape)
        )
        x0 = self._sample_fn_cache[key](params, rng, latents, class_labels)
        return unnormalize_to_zero_to_one(x0)
