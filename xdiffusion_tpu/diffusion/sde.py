"""Score-SDE diffusion process (continuous & discrete DSM training,
predictor-corrector sampling).

Behavioral counterpart of /root/reference/xdiffusion/diffusion/sde.py:21-346:
the score network predicts epsilon; the score is -eps/std(t) with std from
the SDE's marginal (continuous) or the discrete alpha-bar table; training
is denoising score matching with sigma^2 (or likelihood g^2) weighting;
sampling runs N predictor-corrector steps over linspace(T, eps, N) —
here as one lax.scan.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.config import (
    DotConfig,
    instantiate_from_config,
    type_from_config,
)
from xdiffusion_tpu.utils import (
    broadcast_from_left,
    mean_flat,
    normalize_to_neg_one_to_one,
    unnormalize_to_zero_to_one,
)


class GaussianDiffusion_SDE:
    def __init__(self, config: DotConfig):
        self._config = config
        diff = config.diffusion
        self._continuous = bool(diff.continuous)
        self._likelihood_weighting = bool(
            diff.get("likelihood_weighting", False)
        )

        sn_cfg = diff.score_network
        sn_cls = type_from_config(sn_cfg.to_dict())
        self._score_network = sn_cls(config=DotConfig(sn_cfg.params.to_dict()))

        self._context_preprocessors = [
            instantiate_from_config(c)
            for c in diff.get("context_preprocessing", [])
        ]
        self._sde = instantiate_from_config(diff.sde.to_dict())
        self._sampler = instantiate_from_config(diff.sampling.to_dict())
        self._sample_fn_cache = {}

    # -- protocol ----------------------------------------------------------

    def config(self) -> DotConfig:
        return self._config

    def models(self) -> List:
        return [self]

    def sde(self):
        return self._sde

    def score_network(self):
        return self._score_network

    # -- params --------------------------------------------------------------

    def init_params(self, rng: jax.Array, batch_size: int = 2):
        data = self._config.data
        x = jnp.zeros(
            (batch_size, data.image_size, data.image_size, data.num_channels)
        )
        ctx = {"timestep": jnp.zeros((batch_size,), dtype=jnp.float32)}
        return jax.jit(self._score_network.init)(rng, x, ctx)

    # -- score ---------------------------------------------------------------

    def predict_score(
        self, params, x: jax.Array, t: jax.Array,
        deterministic: bool = True, rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """score(x, t) = -eps_theta(x, t) / std(t); t in [0, 1]
        (reference: sde.py:195-227)."""
        if self._continuous:
            labels = t * 999.0
            std = self._sde.marginal_prob(jnp.zeros_like(x), t)[1]
        else:
            labels = t * (self._sde.N - 1)
            std = jnp.take(
                self._sde.sqrt_1m_alphas_cumprod, labels.astype(jnp.int32)
            )
        rngs = {"dropout": rng} if rng is not None else None

        def apply(xx, cc):
            return self._score_network.apply(
                params, xx, cc, deterministic=deterministic, rngs=rngs
            )

        if deterministic:
            # Chunked large-batch forward (see ops/batch_chunk.py and the
            # same dispatch in diffusion/ddpm.py predict_score).
            from xdiffusion_tpu.ops.batch_chunk import chunk_batched_apply

            eps = chunk_batched_apply(apply, x, {"timestep": labels})
        else:
            eps = apply(x, {"timestep": labels})
        return -eps / broadcast_from_left(std, x.shape)

    # -- training ---------------------------------------------------------------

    def loss_on_batch(
        self, params, rng: jax.Array, images: jax.Array, context: Dict,
        timesteps=None, loss_weights=None,
    ) -> Tuple[jax.Array, Dict]:
        b = images.shape[0]
        rng_t, rng_z, rng_drop = jax.random.split(rng, 3)
        eps_t = 1e-5
        x_0 = normalize_to_neg_one_to_one(images)
        t = jax.random.uniform(rng_t, (b,)) * (self._sde.T - eps_t) + eps_t

        z = jax.random.normal(rng_z, x_0.shape)
        mean, std = self._sde.marginal_prob(x_0, t)
        std_b = broadcast_from_left(std, x_0.shape)
        x_t = mean + std_b * z

        score = self.predict_score(
            params, x_t, t, deterministic=False, rng=rng_drop
        )
        if not self._likelihood_weighting:
            losses = mean_flat(jnp.square(score * std_b + z))
        else:
            g2 = self._sde.sde(jnp.zeros_like(x_0), t)[1] ** 2
            losses = mean_flat(jnp.square(score + z / std_b)) * g2
        loss = losses.mean()
        return loss, {
            "loss": loss,
            "mse_loss": loss,
            "vb_loss": jnp.zeros(()),
            "timesteps": t,
            "loss_per_example": jax.lax.stop_gradient(losses),
        }

    # -- sampling -----------------------------------------------------------------

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
        shape = self.sampling_shape(num_samples)
        n = int(num_sampling_steps or self._sde.N)
        key = (num_samples, n)
        if key not in self._sample_fn_cache:
            eps = 1e-3
            timesteps = jnp.asarray(
                np.linspace(self._sde.T, eps, n, dtype=np.float32)
            )
            denoise_final = jnp.asarray(np.arange(n) == n - 1)

            def score_fn(params):
                return lambda x, t: self.predict_score(params, x, t)

            sampler_step_builder = (sampler or self._sampler).build

            def sample_fn(params, rng, initial_noise=None):
                step = sampler_step_builder(self._sde, score_fn(params))
                rng, init_rng = jax.random.split(rng)
                x = (
                    initial_noise
                    if initial_noise is not None
                    else self._sde.prior_sampling(init_rng, shape)
                )

                def body(carry, per):
                    x, key = carry
                    key, sk = jax.random.split(key)
                    t_b = jnp.broadcast_to(per["t"], (shape[0],))
                    x = step(sk, x, t_b, per["final"])
                    return (x, key), None

                (x, _), _ = jax.lax.scan(
                    body, (x, rng), {"t": timesteps, "final": denoise_final}
                )
                return unnormalize_to_zero_to_one(x)

            self._sample_fn_cache[key] = jax.jit(sample_fn)
        return self._sample_fn_cache[key](params, rng, initial_noise)
