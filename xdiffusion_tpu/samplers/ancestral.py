"""Ancestral (DDPM) sampler as a scan step function.

Behavioral counterpart of the reference AncestralSampler
(/root/reference/xdiffusion/samplers/ancestral.py:11-350): posterior-mean
reparameterization of the predicted x0, fixed-large or learned variance,
optional classifier guidance on the mean, and the t=0 branch returning the
clean prediction — expressed with `jnp.where` on a per-step flag so the
whole trajectory stays inside one scan.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.samplers.base import ReverseProcessSampler, predict_x_hat


class AncestralSampler(ReverseProcessSampler):
    def __init__(self, **kwargs):
        pass

    def step_context(self, process, num_steps: int) -> Dict[str, jax.Array]:
        sched = process.noise_scheduler()
        idx = np.arange(num_steps - 1, -1, -1, dtype=np.int32)  # T-1 ... 0
        ctx = {"timestep_idx": jnp.asarray(idx), "is_last": jnp.asarray(idx == 0)}
        if sched.continuous():
            t = idx.astype(np.float32)
            ctx["timestep"] = jnp.asarray(t / num_steps)
            ctx["logsnr_s"] = sched.logsnr(jnp.asarray(t / num_steps))
            ctx["logsnr_t"] = sched.logsnr(jnp.asarray((t + 1.0) / num_steps))
        else:
            # Discrete ancestral sampling walks the native schedule
            # (reference behavior: full num_scales steps).
            ctx["timestep"] = jnp.asarray(idx)
        return ctx

    def p_sample(
        self,
        x: jax.Array,
        context: Dict,
        unconditional_context: Optional[Dict],
        process,
        params,
        rng: jax.Array,
        classifier_free_guidance: Optional[float] = None,
        guidance_fn=None,
    ) -> jax.Array:
        x_hat, variance, log_variance, _ = predict_x_hat(
            process,
            params,
            x,
            context,
            unconditional_context,
            classifier_free_guidance,
            clip_denoised=True,
        )
        mean, _, _ = process.noise_scheduler().q_posterior(
            x_start=x_hat, x_t=x, context=context
        )

        if guidance_fn is not None:
            # Classifier guidance shifts the posterior mean by var * grad
            # log p(y|x) (Sohl-Dickstein conditioning, reference
            # ancestral.py:326-350).
            gradient = guidance_fn(x, context["timestep"], context.get("classes"))
            mean = mean + variance * gradient

        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        x_prev = mean + jnp.exp(0.5 * log_variance) * noise
        is_last = context["is_last"]
        return jnp.where(is_last, x_hat, x_prev)
