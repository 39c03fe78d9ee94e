"""Imagen-style cascaded diffusion (base model + super-resolution stages).

Behavioral counterpart of /root/reference/xdiffusion/diffusion/
cascade.py:17-179: each stage is its own per-YAML DDPM process; training
sums per-stage losses with automatically-built low-res conditioning
(images resized to each stage's input/conditioning sizes on device);
sampling chains stage outputs into the next stage's
`super_resolution.conditioning_key`.

Parameters are a dict {"stage_1": params, "stage_2": params, ...} so the
whole cascade trains in one jitted step (per-stage optimizers arrive via
optax.multi_transform if configured).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from xdiffusion_tpu.config import DotConfig, load_yaml
from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM


def _resize(images: jax.Array, size: int) -> jax.Array:
    b, h, w, c = images.shape
    if h == size and w == size:
        return images
    return jax.image.resize(images, (b, size, size, c), method="bilinear")


class GaussianDiffusionCascade:
    def __init__(self, config: DotConfig, config_dir: Optional[str] = None):
        self._config = config
        self._layers: List[GaussianDiffusion_DDPM] = []
        layer_idx = 1
        while True:
            layer_name = f"cascade_layer_{layer_idx}"
            if layer_name not in config.diffusion_cascade:
                break
            config_path = config.diffusion_cascade[layer_name].config
            if config_dir and not os.path.isabs(config_path):
                candidate = os.path.join(config_dir, config_path)
                if os.path.exists(candidate):
                    config_path = candidate
            self._layers.append(GaussianDiffusion_DDPM(load_yaml(config_path)))
            layer_idx += 1
        assert self._layers, "cascade has no stages"

    # -- protocol -------------------------------------------------------------

    def config(self) -> DotConfig:
        return self._config

    def models(self) -> List[GaussianDiffusion_DDPM]:
        return list(self._layers)

    def importance_sampler(self):
        return self._layers[0].importance_sampler()

    # -- params ---------------------------------------------------------------

    def init_params(self, rng: jax.Array, batch_size: int = 2) -> Dict:
        params = {}
        for i, layer in enumerate(self._layers):
            rng, sub = jax.random.split(rng)
            params[f"stage_{i+1}"] = layer.init_params(sub, batch_size)
        return params

    # -- training ----------------------------------------------------------------

    def loss_on_batch(
        self, params: Dict, rng: jax.Array, images: jax.Array, context: Dict,
        timesteps=None, loss_weights=None,
    ) -> Tuple[jax.Array, Dict]:
        """Sum of per-stage losses (reference cascade.py:79-133); images
        arrive at the final-stage resolution in NHWC [0,1]."""
        total = 0.0
        metrics = {}
        for i, layer in enumerate(self._layers):
            rng, sub = jax.random.split(rng)
            layer_cfg = layer.config()
            layer_ctx = dict(context)
            layer_images = images
            if "super_resolution" in layer_cfg:
                low_size = layer_cfg.super_resolution.low_resolution_size
                layer_ctx[layer_cfg.super_resolution.conditioning_key] = _resize(
                    images, low_size
                )
            model_size = layer_cfg.data.image_size
            layer_images = _resize(images, model_size)
            loss, m = layer.loss_on_batch(
                params[f"stage_{i+1}"], sub, layer_images, layer_ctx
            )
            total = total + loss
            metrics[f"stage_{i+1}_loss"] = m["loss"]
        b = images.shape[0]
        return total, {
            "loss": total,
            "mse_loss": total,
            "vb_loss": jnp.zeros(()),
            "timesteps": jnp.zeros((b,), dtype=jnp.int32),
            "loss_per_example": jnp.zeros((b,)),
            **metrics,
        }

    # -- sampling -----------------------------------------------------------------

    def sample(
        self,
        params: Dict,
        rng: jax.Array,
        num_samples: int = 16,
        context: Optional[Dict] = None,
        classifier_free_guidance: Optional[float] = None,
        num_sampling_steps: Optional[int] = None,
        sampler=None,
        initial_noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Chain stages: stage k output feeds stage k+1's conditioning key
        (reference cascade.py:148-179)."""
        output = None
        for i, layer in enumerate(self._layers):
            rng, sub = jax.random.split(rng)
            layer_ctx = dict(context or {})
            if output is not None:
                key = layer.config().super_resolution.conditioning_key
                layer_ctx[key] = output
            output = layer.sample(
                params[f"stage_{i+1}"],
                sub,
                num_samples=num_samples,
                context=layer_ctx,
                classifier_free_guidance=classifier_free_guidance,
                num_sampling_steps=num_sampling_steps,
            )
        return output
