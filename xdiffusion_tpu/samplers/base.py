"""Sampler protocol + shared prediction helpers.

Counterpart of /root/reference/xdiffusion/samplers/base.py:6-33, with the
model-evaluation plumbing (reference ancestral.py:271-350 `_pred_epsilon` /
`_pred_x_hat`) lifted here so every sampler shares one implementation.

CFG design note: the reference evaluates the score network twice per step
(conditional then unconditional, ancestral.py:219-238). Here guidance is a
single forward on a 2x-batched input — on TPU this keeps the MXU fed with
one large matmul stream instead of two half-sized ones and halves kernel
launch/fusion overhead inside the scan body.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from xdiffusion_tpu.diffusion import PredictionType
from xdiffusion_tpu.utils import dynamic_thresholding


def _merge_cfg_context(
    batch: int, context: Dict, unconditional_context: Dict
) -> Dict:
    """Concatenate cond/uncond contexts along the batch axis.

    Only array signals with a leading batch dim differ between branches;
    per-step scalars and non-batched values pass through untouched.
    """
    merged = {}
    for key, value in context.items():
        uvalue = unconditional_context.get(key, value)
        if (
            isinstance(value, jnp.ndarray)
            and value.ndim >= 1
            and value.shape[0] == batch
        ):
            merged[key] = jnp.concatenate(
                [value, jnp.broadcast_to(uvalue, value.shape)], axis=0
            )
        else:
            merged[key] = value
    return merged


def predict_epsilon(
    process,
    params,
    x: jax.Array,
    context: Dict,
    unconditional_context: Optional[Dict],
    classifier_free_guidance: Optional[float],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Model prediction (epsilon or v) + variance, with optional CFG.

    Returns (prediction, variance, log_variance). Learned-sigma models
    produce the variance from the network output; otherwise the scheduler's
    "fixedlarge" estimate is used (reference ancestral.py:271-350).
    """
    cfg = classifier_free_guidance

    def run(x_in, ctx):
        x_in = process.process_input(x_in, ctx)
        out = process.predict_score(params, x_in, ctx)
        if process.is_learned_sigma():
            pred, log_variance = out
            variance = jnp.exp(log_variance)
        else:
            pred = out
            sched = process.noise_scheduler()
            if hasattr(sched, "variance_fixed_large"):
                variance, log_variance = sched.variance_fixed_large(
                    ctx, out.shape
                )
            else:
                # ODE-style processes (rectified flow) have no reverse
                # variance; samplers that need one don't reach here.
                variance = jnp.zeros_like(pred)
                log_variance = jnp.zeros_like(pred)
        return pred, variance, log_variance

    if cfg is None or cfg < 0.0 or unconditional_context is None:
        return run(x, context)

    b = x.shape[0]
    x2 = jnp.concatenate([x, x], axis=0)
    ctx2 = _merge_cfg_context(b, context, unconditional_context)
    pred2, var2, logvar2 = run(x2, ctx2)
    pred_c, pred_u = pred2[:b], pred2[b:]
    var_c, var_u = var2[:b], var2[b:]
    logvar_c, logvar_u = logvar2[:b], logvar2[b:]
    w = cfg
    pred = pred_u + w * (pred_c - pred_u)
    variance = var_u + w * (var_c - var_u)
    log_variance = logvar_u + w * (logvar_c - logvar_u)
    return pred, variance, log_variance


def predict_x_hat(
    process,
    params,
    z_t: jax.Array,
    context: Dict,
    unconditional_context: Optional[Dict],
    classifier_free_guidance: Optional[float],
    clip_denoised: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Predicted x0 (clipped / dynamically thresholded) + variance + eps.

    Returns (x_hat, variance, log_variance, prediction).
    """
    pred, variance, log_variance = predict_epsilon(
        process, params, z_t, context, unconditional_context,
        classifier_free_guidance,
    )

    sched = process.noise_scheduler()
    if process.prediction_type() == PredictionType.EPSILON:
        x_hat = sched.predict_x_from_epsilon(z=z_t, epsilon=pred, context=context)
    elif process.prediction_type() == PredictionType.V:
        x_hat = sched.predict_x_from_v(z=z_t, v=pred, context=context)
    else:
        raise NotImplementedError(
            f"Prediction type {process.prediction_type()} not supported here."
        )

    dt_cfg = process.dynamic_thresholding_config()
    if clip_denoised:
        if dt_cfg is not None and dt_cfg.enable:
            x_hat = dynamic_thresholding(x_hat, p=dt_cfg.p, c=dt_cfg.c)
        else:
            x_hat = jnp.clip(x_hat, -1.0, 1.0)
    return x_hat, variance, log_variance, pred


class ReverseProcessSampler:
    """Single-step reverse-process sampler contract."""

    def step_context(self, process, num_steps: int) -> Dict[str, jax.Array]:
        """Per-step arrays (leading axis T) scanned by the sample loop.

        The arrays are indexed in scan order: entry 0 is the FIRST update
        applied to x_T (i.e. timestep_idx = num_steps-1), matching the
        reference's reversed(range(num_steps)) host loop.
        """
        raise NotImplementedError

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
        """One reverse step x_t -> x_{t-1}; pure, trace-safe."""
        raise NotImplementedError
