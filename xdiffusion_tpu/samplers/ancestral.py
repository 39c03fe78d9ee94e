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
    def __init__(
        self,
        reconstruction_guidance: bool = False,
        omega: float = 2.0,
        num_frame_overlap: int = 4,
        **kwargs,
    ):
        # Reconstruction guidance for video extension ("Video Diffusion
        # Models" Eq. 7, reference ancestral.py:114-175): when the context
        # carries conditioning frames x_a, the predicted x0 of the overlap
        # region is pulled toward them via the gradient of the overlap
        # reconstruction error — jax.grad through the score network inside
        # the scan step.
        self._reconstruction_guidance = bool(reconstruction_guidance)
        self._omega = float(omega)
        self._num_frame_overlap = int(num_frame_overlap)

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
        if self._reconstruction_guidance and "x_a" in context:
            x_hat, variance, log_variance = self._guided_x_hat(
                x, context, unconditional_context, process, params, rng,
                classifier_free_guidance,
            )
        else:
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

        # Deterministic noise override (reproducibility / cross-stack
        # trajectory tests); threaded per step by the sample loop.
        noise = context.get("sampling_noise")
        if noise is None:
            noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        x_prev = mean + jnp.exp(0.5 * log_variance) * noise.astype(x.dtype)
        is_last = context["is_last"]
        return jnp.where(is_last, x_hat, x_prev)

    def _guided_x_hat(
        self, x, context, unconditional_context, process, params, rng,
        classifier_free_guidance,
    ):
        """VDM Eq. 7: x_tilde_b = x_hat_b - (omega/2) alpha_t *
        grad_z ||x_a - x_hat_a(z)||^2 over the overlap frames."""
        import jax.nn

        from xdiffusion_tpu.utils import broadcast_from_left

        sched = process.noise_scheduler()
        assert sched.continuous(), "reconstruction guidance needs logSNR"
        k = self._num_frame_overlap
        x_a = context["x_a"]  # (B, Fa, H, W, C), model (normalized) space
        t = context["timestep"]
        rng_q = jax.random.fold_in(rng, 11)
        noise = jax.random.normal(rng_q, x_a.shape, dtype=x_a.dtype)

        def overlap_loss(z_b):
            z_a_t = sched.q_sample(x_start=x_a, t=t, noise=noise)
            z_t = jnp.concatenate([z_a_t[:, -k:], z_b[:, k:]], axis=1)
            x_hat_ab, variance, log_variance, _ = predict_x_hat(
                process, params, z_t, context, unconditional_context,
                classifier_free_guidance, clip_denoised=True,
            )
            loss = jnp.mean((x_a[:, -k:] - x_hat_ab[:, :k]) ** 2)
            return loss, (x_hat_ab, variance, log_variance)

        grad, (x_hat_ab, variance, log_variance) = jax.grad(
            overlap_loss, has_aux=True
        )(x)
        logsnr_t = broadcast_from_left(context["logsnr_t"], x.shape)
        alpha_t = jnp.sqrt(jax.nn.sigmoid(logsnr_t))
        factor = self._omega * alpha_t * 0.5
        x_tilde_b = x_hat_ab[:, k:] - (factor * grad)[:, k:]
        x_hat = jnp.concatenate([x_a[:, -k:], x_tilde_b], axis=1)
        return x_hat, variance, log_variance
