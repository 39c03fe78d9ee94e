"""Rectified-flow Euler(-Maruyama) sampler as a scan step function.

Behavioral counterpart of the reference rectified-flow AncestralSampler
(/root/reference/xdiffusion/samplers/rectified_flow.py:11-85): time runs
forward 0 -> 1 in the ODE view; each step maps the scan's descending
timestep_idx onto num_t in [eps, T-eps] and takes x += v_theta * dt (the
diffusion term vanishes because sigma_t == 0 for rectified flow).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.samplers.base import ReverseProcessSampler, predict_epsilon


class AncestralSampler(ReverseProcessSampler):
    """Euler solver on the learned velocity field."""

    def __init__(self, **kwargs):
        pass

    def step_context(self, process, num_steps: int) -> Dict[str, jax.Array]:
        sde = process.sde()
        eps = 1e-3
        idx = np.arange(num_steps - 1, -1, -1, dtype=np.int32)
        # Reference semantics (samplers/rectified_flow.py:48-57): the
        # index flip and the time mapping use the SDE's full N — not the
        # respaced step count — and dt is always 1/N. With num_steps < N
        # this integrates only the final num_steps/N of the ODE (a
        # reference quirk kept for golden parity; at num_steps == N, the
        # full-ladder operating point, both readings coincide).
        fwd = sde.N - (idx + 1)
        num_t = fwd.astype(np.float32) / sde.N * (sde.T - eps) + eps
        return {
            "timestep_idx": jnp.asarray(idx),
            "timestep": jnp.asarray(num_t),
            "is_last": jnp.asarray(idx == 0),
            "dt": jnp.full((num_steps,), 1.0 / sde.N, dtype=np.float32),
        }

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
        # Velocity prediction; CFG mixes velocities like epsilons.
        pred, _, _ = predict_epsilon(
            process, params, x, context, unconditional_context,
            classifier_free_guidance,
        )
        sde = process.sde()
        num_t = context["timestep"]
        dt = context["dt"]
        sigma_t = sde.sigma_t(num_t)

        # General Euler-Maruyama reverse step; for rectified flow
        # sigma_t == 0 so this reduces to the pure ODE x += v * dt.
        s = sigma_t.reshape((-1,) + (1,) * (x.ndim - 1)) if sigma_t.ndim else sigma_t
        t_b = num_t.reshape((-1,) + (1,) * (x.ndim - 1)) if num_t.ndim else num_t
        correction = (s**2) / (
            2.0 * (sde.noise_scale() ** 2) * ((1.0 - t_b) ** 2)
        ) * (0.5 * t_b * (1.0 - t_b) * pred - 0.5 * (2.0 - t_b) * x)
        drift = pred + correction
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        return x + drift * dt + s * jnp.sqrt(dt) * noise
