"""Diffusion processes.

The central abstraction mirrors the reference `DiffusionModel` interface
(/root/reference/xdiffusion/diffusion/__init__.py:13-98) re-cut along
JAX's functional seams: a process owns its score network *module*,
scheduler, and preprocessors, while parameters/optimizer state live in an
explicit TrainState threaded through pure jitted functions.
"""

from enum import Enum


class PredictionType(Enum):
    EPSILON = "epsilon"
    V = "v"
    RECTIFIED_FLOW = "rectified_flow"


def prediction_type_from_config(parameterization: str) -> PredictionType:
    key = parameterization.lower().replace("-", "_")
    if key == "epsilon":
        return PredictionType.EPSILON
    if key == "v":
        return PredictionType.V
    if key in ("rectified_flow", "rectifiedflow"):
        return PredictionType.RECTIFIED_FLOW
    raise NotImplementedError(f"Unknown parameterization {parameterization!r}")
