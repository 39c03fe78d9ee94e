"""EMA utilities + the consistency/progressive-distillation scale schedules.

Behavioral counterpart of /root/reference/xdiffusion/layers/ema.py:4-79:
`update_ema` as a pure pytree map (device-side, fuses into the train
step) and `create_ema_and_scales_fn` producing the (ema_rate, num_scales)
schedule on the host (fixed / adaptive EMA x fixed / progressive /
progdist scale modes).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import numpy as np


def update_ema(target_params, source_params, rate: float = 0.99):
    """target <- rate * target + (1 - rate) * source, as a new pytree."""
    return jax.tree_util.tree_map(
        lambda t, s: t * rate + s * (1.0 - rate), target_params, source_params
    )


def create_ema_and_scales_fn(
    target_ema_mode: str,
    start_ema: float,
    total_steps: int,
    scale_mode: str = "fixed",
    start_scales: float = 0,
    end_scales: float = 0,
    distill_steps_per_iter: int = 0,
    **_ignored,
) -> Callable[[int], Tuple[float, int]]:
    """step -> (target_ema_rate, num_scales) schedule (Consistency Models,
    Sec. 5; progressive distillation progdist mode)."""
    assert target_ema_mode in ("fixed", "adaptive")
    assert scale_mode in ("fixed", "progressive", "progdist")

    def ema_and_scales_fn(step: int) -> Tuple[float, int]:
        if target_ema_mode == "fixed" and scale_mode == "fixed":
            target_ema = start_ema
            scales = start_scales
        elif scale_mode == "progressive":
            scales = np.ceil(
                np.sqrt(
                    (step / total_steps)
                    * ((end_scales + 1) ** 2 - start_scales**2)
                    + start_scales**2
                )
                - 1
            ).astype(np.int64)
            scales = np.maximum(scales, 1)
            if target_ema_mode == "adaptive":
                c = -np.log(start_ema) * start_scales
                target_ema = float(np.exp(-c / scales))
            else:
                target_ema = start_ema
            scales = scales + 1
        else:  # fixed + progdist
            assert distill_steps_per_iter > 0
            distill_stage = step // distill_steps_per_iter
            scales = start_scales // (2**distill_stage)
            scales = np.maximum(scales, 2)
            sub_stage = np.maximum(
                step - distill_steps_per_iter * (np.log2(start_scales) - 1), 0
            )
            sub_stage = sub_stage // (distill_steps_per_iter * 2)
            sub_scales = 2 // (2**sub_stage)
            sub_scales = np.maximum(sub_scales, 1)
            scales = np.where(scales == 2, sub_scales, scales)
            target_ema = 1.0

        return float(target_ema), int(scales)

    return ema_and_scales_fn
