"""Super-resolution conditioning: low-res concat + gaussian conditioning
augmentation (GCA).

Behavioral counterpart of /root/reference/xdiffusion/layers/
super_resolution.py:10-157 (Imagen-style cascades): the input preprocessor
bilinearly upsamples the low-resolution conditioning to the model size,
optionally noises it to a (random or fixed) augmentation level via the
forward process, records the augmentation timestep in the context, and
concatenates on the channel axis. `GaussianConditioningAugmentationToTimestep`
folds the augmentation level into the timestep embedding.

Pure and trace-safe: randomness comes from context["preprocessor_rng"]
threaded by the loss/sampling programs.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from xdiffusion_tpu.layers.embedding import TimestepEmbeddingProjection
from xdiffusion_tpu.utils import normalize_to_neg_one_to_one


class InputPreprocessor:
    """Low-res channel-concat with optional GCA (spatial or temporal)."""

    def __init__(
        self,
        low_resolution_size: int,
        super_resolution_size: int,
        context_input_key: str,
        apply_gaussian_conditioning_augmentation: bool,
        is_spatial: bool = True,
        is_temporal: bool = False,
        **kwargs,
    ):
        assert is_temporal ^ is_spatial
        self.low_resolution_size = int(low_resolution_size)
        self.super_resolution_size = int(super_resolution_size)
        self.context_input_key = context_input_key
        self.apply_gca = bool(apply_gaussian_conditioning_augmentation)
        self.is_spatial = bool(is_spatial)
        self.is_temporal = bool(is_temporal)
        if "temporal_upsampling" in kwargs:
            assert kwargs["temporal_upsampling"].startswith("frameskip")
            self.temporal_skip = int(kwargs["temporal_upsampling"].split("_")[1])
        elif self.is_temporal:
            assert self.super_resolution_size % self.low_resolution_size == 0
            self.temporal_skip = (
                self.super_resolution_size // self.low_resolution_size
            )

    def __call__(self, x: jax.Array, context: Dict, noise_scheduler=None,
                 **kwargs) -> jax.Array:
        low_res = context[self.context_input_key]  # [0,1] pixels
        b = low_res.shape[0]

        if self.is_spatial:
            # (B, [F,] h, w, C) -> (B, [F,] H, W, C) bilinear: only the two
            # trailing spatial dims change, so the same expression covers
            # image (4D) and video (5D) super-resolution.
            target = low_res.shape[:-3] + (
                self.super_resolution_size,
                self.super_resolution_size,
                low_res.shape[-1],
            )
            low_res_x0 = normalize_to_neg_one_to_one(
                jax.image.resize(low_res, target, method="bilinear")
            )
        else:
            # Temporal SR by frame repetition: (B, F, H, W, C).
            low_res_x0 = normalize_to_neg_one_to_one(
                jnp.repeat(low_res, self.temporal_skip, axis=1)[
                    :, : self.super_resolution_size
                ]
            )

        if self.apply_gca and noise_scheduler is not None:
            if "augmentation_level" in context:
                level = context["augmentation_level"]
                if noise_scheduler.continuous():
                    s = jnp.full((b,), level, dtype=jnp.float32)
                else:
                    # level may be a traced scalar (context crosses the jit
                    # boundary as arrays) — cast, don't int().
                    s = jnp.broadcast_to(
                        (noise_scheduler.steps() * jnp.asarray(level)).astype(
                            jnp.int32
                        ),
                        (b,),
                    )
            elif "augmentation_timestep" in context:
                s = context["augmentation_timestep"]
            else:
                rng = context["preprocessor_rng"]
                rng_t, rng_n = jax.random.split(rng)
                s, _ = noise_scheduler.sample_random_times(rng_t, b)
            noise_rng = jax.random.fold_in(
                context.get("preprocessor_rng", jax.random.PRNGKey(0)), 1
            )
            noise = jax.random.normal(noise_rng, low_res_x0.shape)
            low_res_x0 = noise_scheduler.q_sample(low_res_x0, s, noise)
            context["augmentation_timestep"] = s

        return jnp.concatenate([x, low_res_x0], axis=-1)


class GaussianConditioningAugmentationToTimestep:
    """Context head op: timestep_embedding += proj(augmentation_timestep).

    Pure glue: the actual TimestepEmbeddingProjection must live in the
    score network's projection dict (the network registers it via
    `make_projection()` under the key 'augmentation_timestep' so its
    parameters are part of the module tree)."""

    projection_key = "augmentation_timestep"

    def __init__(self, num_features: int, time_embedding_mult: int, **kwargs):
        self.num_features = int(num_features)
        self.time_embedding_mult = int(time_embedding_mult)

    def make_projection(self) -> TimestepEmbeddingProjection:
        return TimestepEmbeddingProjection(
            num_features=self.num_features,
            time_embedding_mult=self.time_embedding_mult,
        )

    def __call__(self, context: Dict, projections: Dict) -> Dict:
        assert "timestep_embedding" in context
        assert "augmentation_timestep" in context
        proj = projections[self.projection_key]
        new_context = dict(context)
        emb = proj(context["augmentation_timestep"])
        new_context["timestep_embedding"] = context["timestep_embedding"] + emb
        return new_context
