"""TrainState + the jitted, sharded training step.

Replaces the reference's eager host loop body (reference
training/image/train.py:288-385: forward, backward, clip, step, EMA as
separate host-dispatched ops with a DDP all-reduce inside
accelerator.backward) with ONE compiled XLA program: loss+grad, global-norm
clip, optimizer update, and EMA all fuse; the gradient all-reduce over the
'data' mesh axis is derived by XLA from the shardings.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any = None  # None disables EMA tracking
    # Device-resident loss-history state for loss-aware importance sampling
    # (ImportanceSampler.init_device_state()); None when unused.
    importance_state: Any = None


def create_train_state(
    params,
    tx: optax.GradientTransformation,
    ema: bool = False,
    importance_sampler=None,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
        importance_state=(
            importance_sampler.init_device_state()
            if importance_sampler is not None
            and hasattr(importance_sampler, "init_device_state")
            else None
        ),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    ema_decay: Optional[float] = None,
    param_transform: Optional[Callable[[Any], Any]] = None,
    importance_sampler=None,
    state_shardings: Optional[Any] = None,
) -> Callable[[TrainState, Dict, jax.Array], Tuple[TrainState, Dict]]:
    """Builds the jitted train step.

    batch: dict with 'images' (B, H, W, C) in [0,1]; every other array key
    is conditioning context (already resolved to arrays by host-side
    preprocessors). Optional 'timesteps'/'loss_weights' keys feed
    host-side importance sampling.

    param_transform maps the OPTIMIZED pytree to the EFFECTIVE model
    parameters inside the traced loss (LoRA fine-tuning optimizes the
    low-rank factors; the transform closes over the frozen base params and
    applies the deltas — the base never enters the optimizer state).

    The returned step donates `state` (in-place buffer reuse on device) and
    expects the batch sharded over the mesh 'data' axis.
    """

    def step_fn(
        state: TrainState, batch: Dict, rng: jax.Array
    ) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(rng, state.step)
        images = batch["images"]
        timesteps = batch.get("timesteps")
        loss_weights = batch.get("loss_weights")
        if (
            timesteps is None
            and importance_sampler is not None
            and state.importance_state is not None
        ):
            # Loss-aware importance sampling entirely on device: draw
            # (t, w) from the device-resident loss-history distribution.
            rng, rng_t = jax.random.split(rng)
            timesteps, loss_weights = importance_sampler.device_sample(
                rng_t, images.shape[0], state.importance_state
            )
        context = {
            k: v
            for k, v in batch.items()
            if k not in ("images", "timesteps", "loss_weights")
        }

        def loss_fn(params):
            if param_transform is not None:
                params = param_transform(params)
            loss, metrics = model.loss_on_batch(
                params,
                rng,
                images,
                context,
                timesteps=timesteps,
                loss_weights=loss_weights,
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if state.ema_params is not None:
            decay = ema_decay if ema_decay is not None else 0.9999
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * decay + p * (1.0 - decay),
                state.ema_params,
                new_params,
            )

        new_importance = state.importance_state
        if importance_sampler is not None and state.importance_state is not None:
            new_importance = importance_sampler.device_update(
                state.importance_state,
                metrics["timesteps"],
                metrics["loss_per_example"],
            )

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            importance_state=new_importance,
        )
        if state_shardings is not None:
            # Pin the updated state to the mesh-derived layout (fsdp/
            # tensor/expert parameter shardings from parallel/placement.py)
            # so the sharded layout is an invariant across steps rather
            # than a GSPMD propagation outcome.
            new_state = jax.lax.with_sharding_constraint(
                new_state, state_shardings
            )
        out_metrics = {
            "loss": metrics["loss"],
            "mse_loss": metrics["mse_loss"],
            "vb_loss": metrics["vb_loss"],
            "grad_norm": optax.global_norm(grads),
            "timesteps": metrics["timesteps"],
            "loss_per_example": metrics["loss_per_example"],
        }
        return new_state, out_metrics

    return jax.jit(step_fn, donate_argnums=(0,))
