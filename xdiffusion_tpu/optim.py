"""Optimizer factories bridging config `target:` blocks to optax.

Reference configs name torch optimizers/schedulers (`torch.optim.Adam`,
`torch.optim.lr_scheduler.LinearLR`, see configs/image/mnist/pixart_alpha.yaml
in the reference); these factories translate those semantics onto optax.
The training loop composes: clip_by_global_norm -> optimizer(schedule).
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax

# Reference training defaults (reference ddpm.py:816-842): Adam lr=2e-4,
# betas=(0.9, 0.99), global-norm grad clip 1.0.
DEFAULT_LR = 2e-4
DEFAULT_BETAS = (0.9, 0.99)
DEFAULT_GRAD_CLIP = 1.0


class Schedule:
    """A learning-rate schedule factory deferred until step horizon is known."""

    def __call__(self, base_lr: float) -> optax.Schedule:
        raise NotImplementedError


class ConstantLR(Schedule):
    """torch ConstantLR semantics: lr * factor for total_iters, then lr."""

    def __init__(self, factor: float = 1.0, total_iters: int = 0, **kwargs):
        self.factor = float(factor)
        self.total_iters = int(total_iters)

    def __call__(self, base_lr: float) -> optax.Schedule:
        if self.total_iters == 0 or self.factor == 1.0:
            return optax.constant_schedule(base_lr)
        return optax.join_schedules(
            [
                optax.constant_schedule(base_lr * self.factor),
                optax.constant_schedule(base_lr),
            ],
            boundaries=[self.total_iters],
        )


class LinearLR(Schedule):
    """torch LinearLR semantics: linear ramp start_factor->end_factor."""

    def __init__(
        self,
        start_factor: float = 1.0 / 3.0,
        end_factor: float = 1.0,
        total_iters: int = 5,
        **kwargs,
    ):
        self.start_factor = float(start_factor)
        self.end_factor = float(end_factor)
        self.total_iters = int(total_iters)

    def __call__(self, base_lr: float) -> optax.Schedule:
        ramp = optax.linear_schedule(
            init_value=base_lr * self.start_factor,
            end_value=base_lr * self.end_factor,
            transition_steps=self.total_iters,
        )
        return ramp


class Optimizer:
    """Holds optimizer hyperparams; `.build(schedule)` yields the optax tx."""

    def __init__(
        self,
        lr: float = DEFAULT_LR,
        betas: Sequence[float] = DEFAULT_BETAS,
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        grad_clip: Optional[float] = DEFAULT_GRAD_CLIP,
        **kwargs,
    ):
        self.lr = float(lr)
        self.betas = tuple(betas)
        self.eps = float(eps)
        self.weight_decay = float(weight_decay)
        self.grad_clip = grad_clip

    def _core(self, learning_rate) -> optax.GradientTransformation:
        raise NotImplementedError

    def build(
        self, schedule: Optional[Schedule] = None
    ) -> optax.GradientTransformation:
        learning_rate = schedule(self.lr) if schedule is not None else self.lr
        parts = []
        if self.grad_clip is not None:
            parts.append(optax.clip_by_global_norm(self.grad_clip))
        parts.append(self._core(learning_rate))
        return optax.chain(*parts)


class Adam(Optimizer):
    def _core(self, learning_rate):
        return optax.adam(
            learning_rate, b1=self.betas[0], b2=self.betas[1], eps=self.eps
        )


class AdamW(Optimizer):
    def __init__(self, weight_decay: float = 1e-2, **kwargs):
        kwargs.pop("weight_decay", None)
        super().__init__(weight_decay=weight_decay, **kwargs)

    def _core(self, learning_rate):
        return optax.adamw(
            learning_rate,
            b1=self.betas[0],
            b2=self.betas[1],
            eps=self.eps,
            weight_decay=self.weight_decay,
        )


def default_optimizer() -> Adam:
    return Adam()
