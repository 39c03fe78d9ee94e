"""Consistency models: training, distillation, EMA target network.

Behavioral counterpart of /root/reference/xdiffusion/diffusion/
consistency.py:25-653 ("Consistency Models", arXiv:2303.01469):

- the online score network and its EMA target are parallel parameter
  trees inside ONE TrainState-compatible params dict ({"score", "target",
  "ema"?}) so the whole update (loss grad on score, EMA move of target)
  stays in a single jitted step;
- N-scales / EMA-rate progression is the host-side schedule from
  layers.ema.create_ema_and_scales_fn; num_scales enters the jitted loss
  as a traced scalar (dynamic randint bound), so no recompiles as N grows;
- losses: consistency training (Euler solver from ground truth x0) and
  consistency distillation (Heun solver through a frozen teacher).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from xdiffusion_tpu.config import DotConfig, instantiate_from_config
from xdiffusion_tpu.layers.ema import create_ema_and_scales_fn, update_ema
from xdiffusion_tpu.utils import (
    broadcast_from_left,
    mean_flat,
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)


def get_weightings(weight_schedule: str, snrs: jax.Array, sigma_data: float):
    if weight_schedule == "snr":
        return snrs
    if weight_schedule == "snr+1":
        return snrs + 1.0
    if weight_schedule == "karras":
        return snrs + 1.0 / sigma_data**2
    if weight_schedule == "truncated-snr":
        return jnp.clip(snrs, 1.0, None)
    if weight_schedule == "uniform":
        return jnp.ones_like(snrs)
    raise NotImplementedError(weight_schedule)


def _karras_boundaries(indices, num_scales, sigma_min, sigma_max, rho):
    """sigma(t_i), sigma(t_{i+1}) for rho-spaced boundaries; num_scales may
    be a traced scalar."""
    inv_rho_max = sigma_max ** (1.0 / rho)
    inv_rho_min = sigma_min ** (1.0 / rho)
    denom = jnp.maximum(num_scales - 1, 1).astype(jnp.float32)
    t = (inv_rho_max + indices / denom * (inv_rho_min - inv_rho_max)) ** rho
    t2 = (inv_rho_max + (indices + 1) / denom * (inv_rho_min - inv_rho_max)) ** rho
    return t, t2


class _ConsistencyLossBase:
    def __init__(
        self,
        sigma_data: float = 0.5,
        rho: float = 7.0,
        loss_norm: str = "l2",
        weight_schedule: str = "uniform",
        **_,
    ):
        self.sigma_data = float(sigma_data)
        self.rho = float(rho)
        self.loss_norm = loss_norm
        self.weight_schedule = weight_schedule

    def _norm(self, distiller, target, weights):
        if self.loss_norm == "l1":
            return mean_flat(jnp.abs(distiller - target)) * weights
        if self.loss_norm in ("l2", "lpips", "l2-32"):
            # lpips requires pretrained VGG features (unavailable offline);
            # it degrades to l2, which the reference MNIST configs use.
            return mean_flat((distiller - target) ** 2) * weights
        raise ValueError(f"Unknown loss norm {self.loss_norm}")


class ConsistencyTrainingLoss(_ConsistencyLossBase):
    """Eq. 10 of arXiv:2303.01469: match f(x_{t_{i+1}}) to
    target-f(Euler step toward x0)."""

    def __call__(
        self,
        net,
        score_params,
        target_params,
        rng: jax.Array,
        images: jax.Array,
        num_scales: jax.Array,
        labels=None,
    ) -> jax.Array:
        x_start = images
        rng_i, rng_n = jax.random.split(rng)
        noise = jax.random.normal(rng_n, x_start.shape)
        b = x_start.shape[0]
        indices = jax.random.randint(
            rng_i, (b,), 0, jnp.maximum(num_scales - 1, 1)
        ).astype(jnp.float32)
        t, t2 = _karras_boundaries(
            indices, num_scales, net.sigma_min, net.sigma_max, self.rho
        )

        x_t = x_start + noise * broadcast_from_left(t, x_start.shape)
        distiller = net.apply(score_params, x_t, t, class_labels=labels)

        # Euler solver from the ground-truth x0 (training mode).
        d = (x_t - x_start) / broadcast_from_left(t, x_t.shape)
        x_t2 = x_t + d * broadcast_from_left(t2 - t, x_t.shape)
        x_t2 = jax.lax.stop_gradient(x_t2)
        distiller_target = jax.lax.stop_gradient(
            net.apply(target_params, x_t2, t2, class_labels=labels)
        )

        weights = get_weightings(self.weight_schedule, t**-2, self.sigma_data)
        return self._norm(distiller, distiller_target, weights)


class ConsistencyDistillationLoss(_ConsistencyLossBase):
    """Eq. 7 of arXiv:2303.01469: Heun step through a frozen teacher."""

    def __call__(
        self,
        net,
        score_params,
        target_params,
        rng: jax.Array,
        images: jax.Array,
        num_scales: jax.Array,
        teacher_denoise_fn: Callable = None,
        labels=None,
    ) -> jax.Array:
        assert teacher_denoise_fn is not None
        x_start = images
        rng_i, rng_n = jax.random.split(rng)
        noise = jax.random.normal(rng_n, x_start.shape)
        b = x_start.shape[0]
        indices = jax.random.randint(
            rng_i, (b,), 0, jnp.maximum(num_scales - 1, 1)
        ).astype(jnp.float32)
        t, t2 = _karras_boundaries(
            indices, num_scales, net.sigma_min, net.sigma_max, self.rho
        )

        x_t = x_start + noise * broadcast_from_left(t, x_start.shape)
        distiller = net.apply(score_params, x_t, t, class_labels=labels)

        # Heun solver through the teacher.
        denoiser = teacher_denoise_fn(x_t, t)
        d = (x_t - denoiser) / broadcast_from_left(t, x_t.shape)
        samples = x_t + d * broadcast_from_left(t2 - t, x_t.shape)
        denoiser2 = teacher_denoise_fn(samples, t2)
        next_d = (samples - denoiser2) / broadcast_from_left(t2, x_t.shape)
        x_t2 = jax.lax.stop_gradient(
            x_t + (d + next_d) * broadcast_from_left((t2 - t) / 2.0, x_t.shape)
        )
        distiller_target = jax.lax.stop_gradient(
            net.apply(target_params, x_t2, t2, class_labels=labels)
        )
        weights = get_weightings(self.weight_schedule, t**-2, self.sigma_data)
        return self._norm(distiller, distiller_target, weights)


class GaussianDiffusion_ConsistencyModel:
    """Consistency process: params = {"score", "target"[, "ema"]}."""

    def __init__(self, config: DotConfig):
        self._config = config
        diff = config.diffusion
        self._net = instantiate_from_config(diff.score_network.to_dict())
        self._loss = instantiate_from_config(diff.loss.to_dict())
        self._sampler = instantiate_from_config(diff.sampling.to_dict())
        self._has_ema = "exponential_moving_average" in diff

        cm = diff.consistency_model
        self._rho = float(cm.get("rho", 7.0))
        self._target_ema_cfg = cm.target_ema.to_dict()
        self._scale_fn_cache: Dict[int, Callable] = {}
        self._sample_fn_cache = {}

    # -- protocol -------------------------------------------------------------

    def config(self) -> DotConfig:
        return self._config

    def models(self) -> List:
        return [self]

    def score_network(self):
        return self._net

    def scale_fn(self, total_steps: int) -> Callable[[int], Tuple[float, int]]:
        """Host-side (ema_rate, num_scales) schedule for a training run."""
        if total_steps not in self._scale_fn_cache:
            self._scale_fn_cache[total_steps] = create_ema_and_scales_fn(
                total_steps=total_steps, **self._target_ema_cfg
            )
        return self._scale_fn_cache[total_steps]

    # -- params ---------------------------------------------------------------

    def init_params(self, rng: jax.Array, batch_size: int = 2):
        data = self._config.data
        x = jnp.zeros(
            (batch_size, data.image_size, data.image_size, data.num_channels)
        )
        sigma = jnp.ones((batch_size,), dtype=jnp.float32)
        score = self._net.init(rng, x, sigma)
        params = {
            "score": score,
            "target": jax.tree_util.tree_map(jnp.copy, score),
        }
        if self._has_ema:
            params["ema"] = jax.tree_util.tree_map(jnp.copy, score)
        return params

    # -- training ---------------------------------------------------------------

    def loss_on_batch(
        self,
        params: Dict,
        rng: jax.Array,
        images: jax.Array,
        context: Dict,
        timesteps=None,
        loss_weights=None,
        teacher_denoise_fn: Optional[Callable] = None,
    ) -> Tuple[jax.Array, Dict]:
        """context must carry 'num_scales' (traced int32 scalar from the
        host-side schedule)."""
        x = normalize_to_neg_one_to_one(images)
        labels = context.get("classes")
        num_scales = context["num_scales"]
        kwargs = {}
        if isinstance(self._loss, ConsistencyDistillationLoss):
            kwargs["teacher_denoise_fn"] = teacher_denoise_fn
        losses = self._loss(
            self._net,
            params["score"],
            params["target"],
            rng,
            x,
            num_scales,
            labels=labels,
            **kwargs,
        )
        loss = losses.mean()
        return loss, {
            "loss": loss,
            "mse_loss": loss,
            "vb_loss": jnp.zeros(()),
            "timesteps": num_scales,
            "loss_per_example": jax.lax.stop_gradient(losses),
        }

    def update_auxiliary_params(
        self, params: Dict, target_ema: jax.Array, ema_rate: Optional[float]
    ) -> Dict:
        """EMA moves of the target net (rate from the N-schedule) and the
        optional sampling EMA; pure, composes into the train step."""
        new = dict(params)
        new["target"] = jax.tree_util.tree_map(
            lambda t, s: t * target_ema + s * (1.0 - target_ema),
            params["target"],
            params["score"],
        )
        if "ema" in params and ema_rate is not None:
            new["ema"] = update_ema(params["ema"], params["score"], ema_rate)
        return new

    # -- sampling ----------------------------------------------------------------

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
        sample_params = params.get("ema") or params["score"]
        rng, init_rng = jax.random.split(rng)
        latents = (
            initial_noise
            if initial_noise is not None
            else jax.random.normal(init_rng, shape)
        )
        x0 = self._sample_fn_cache[key](sample_params, rng, latents)
        return unnormalize_to_zero_to_one(x0)
