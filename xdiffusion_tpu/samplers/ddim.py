"""DDIM sampler (deterministic logSNR update) as a scan step function.

Behavioral counterpart of the reference DDIMSampler
(/root/reference/xdiffusion/samplers/ddim.py:11-123):
z_s = alpha_s * x_hat + sigma_s * eps_hat with alpha/sigma from the
per-step logSNR pair, and the final step returning x_hat.

Extension over the reference: the reference DDIM only runs on continuous
(logSNR) schedulers; here discrete schedules also work by respacing the
alpha_bar table onto num_steps DDIM points (logsnr = log(ac/(1-ac))),
which is what makes "50-step DDIM on a 1000-step DDPM" a single scan.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.samplers.base import ReverseProcessSampler, predict_x_hat
from xdiffusion_tpu.utils import broadcast_from_left


class DDIMSampler(ReverseProcessSampler):
    def __init__(self, **kwargs):
        pass

    def step_context(self, process, num_steps: int) -> Dict[str, jax.Array]:
        sched = process.noise_scheduler()
        idx = np.arange(num_steps - 1, -1, -1, dtype=np.int32)
        ctx = {"timestep_idx": jnp.asarray(idx), "is_last": jnp.asarray(idx == 0)}
        t = idx.astype(np.float32)
        if sched.continuous():
            ctx["timestep"] = jnp.asarray(t / num_steps)
            ctx["logsnr_s"] = sched.logsnr(jnp.asarray(t / num_steps))
            ctx["logsnr_t"] = sched.logsnr(jnp.asarray((t + 1.0) / num_steps))
        else:
            # Respace the discrete schedule onto num_steps DDIM points:
            # step i of the scan sits at native index round(i * (S-1)/(T-1)).
            native = sched.steps()
            spaced = np.round(
                np.linspace(0, native - 1, num_steps)
            ).astype(np.int32)
            t_native = spaced[idx]  # current native timestep per scan entry
            s_native = np.concatenate([[0], spaced[:-1]])[idx]  # next (lower)
            ctx["timestep"] = jnp.asarray(t_native)
            ctx["logsnr_t"] = sched.logsnr_from_index(jnp.asarray(t_native))
            ctx["logsnr_s"] = sched.logsnr_from_index(jnp.asarray(s_native))
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
        from xdiffusion_tpu.diffusion import PredictionType

        x_hat, _, _, pred = predict_x_hat(
            process,
            params,
            x,
            context,
            unconditional_context,
            classifier_free_guidance,
            clip_denoised=True,
        )
        sched = process.noise_scheduler()
        if process.prediction_type() == PredictionType.EPSILON:
            pred_epsilon = pred
        else:
            # V: the reference derives epsilon from the UNCLIPPED x_hat
            # (ddim.py:86-93 computes pred_epsilon before _maybe_clip), so
            # recompute the raw x_hat from the model output first.
            x_hat_raw = sched.predict_x_from_v(z=x, v=pred, context=context)
            pred_epsilon = sched.predict_epsilon_from_x(
                z=x, x=x_hat_raw, context=context
            )

        logsnr_s = broadcast_from_left(context["logsnr_s"], x.shape)
        alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
        stdv_s = jnp.sqrt(jax.nn.sigmoid(-logsnr_s))
        z_s = alpha_s * x_hat + stdv_s * pred_epsilon
        return jnp.where(context["is_last"], x_hat, z_s)
