"""Forward-process noise schedulers as immutable JAX pytrees.

Behavioral equivalents of the reference schedulers
(/root/reference/xdiffusion/scheduler.py:127-657) redesigned for XLA:

- Each scheduler is a `flax.struct` pytree of precomputed constant tables
  plus pure methods. It can be closed over by a jitted train/sample program
  (tables become compile-time constants) or passed as an argument.
- There is no module state; random-time sampling takes an explicit rng key.
- All per-timestep lookups are `jnp.take` gathers (`utils.extract`), which
  XLA fuses into surrounding elementwise work — nothing here ever needs a
  host round-trip.

The context protocol matches the reference: methods take a `context` dict
carrying `timestep` (B,) and, for continuous schedulers, `logsnr_t` /
`logsnr_s` (B,) values.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from xdiffusion_tpu.utils import broadcast_from_left, extract, log1mexp


# ---------------------------------------------------------------------------
# Beta / logSNR schedules (computed in float64 numpy at build time, stored f32)
# ---------------------------------------------------------------------------


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Improved-DDPM cosine schedule (Nichol & Dhariwal 2021, Eq. 17)."""
    x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


def linear_beta_schedule(
    timesteps: int, min_beta: float = 1e-4, max_beta: float = 0.02
) -> np.ndarray:
    """DDPM linear schedule, rescaled so any step count matches 1000-step betas."""
    scale = 1000.0 / timesteps
    return np.linspace(
        scale * min_beta, scale * max_beta, timesteps, dtype=np.float64
    )


def quadratic_beta_schedule(
    timesteps: int, min_beta: float = 1e-4, max_beta: float = 0.02
) -> np.ndarray:
    scale = 1000.0 / timesteps
    return (
        np.linspace(
            (scale * min_beta) ** 0.5,
            (scale * max_beta) ** 0.5,
            timesteps,
            dtype=np.float64,
        )
        ** 2
    )


def sigmoid_beta_schedule(
    timesteps: int, min_beta: float = 1e-4, max_beta: float = 0.02
) -> np.ndarray:
    scale = 1000.0 / timesteps
    beta_start, beta_end = scale * min_beta, scale * max_beta
    x = np.linspace(-6, 6, timesteps, dtype=np.float64)
    return 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start


def jsd_beta_schedule(timesteps: int) -> np.ndarray:
    return 1.0 / np.linspace(timesteps, 1, timesteps, dtype=np.float64)


def make_beta_schedule(
    schedule_type: str, timesteps: int, min_beta: float = 1e-4, max_beta: float = 0.02
) -> np.ndarray:
    if schedule_type == "cosine":
        return cosine_beta_schedule(timesteps)
    if schedule_type == "linear":
        return linear_beta_schedule(timesteps, min_beta, max_beta)
    if schedule_type == "quadratic":
        return quadratic_beta_schedule(timesteps, min_beta, max_beta)
    if schedule_type == "sigmoid":
        return sigmoid_beta_schedule(timesteps, min_beta, max_beta)
    if schedule_type == "jsd":
        return jsd_beta_schedule(timesteps)
    raise NotImplementedError(f"Noise schedule {schedule_type} not implemented.")


def cosine_logsnr_schedule(
    num_scales: int, logsnr_min: float, logsnr_max: float
) -> np.ndarray:
    """Cosine logSNR schedule (Variational Diffusion Models family)."""
    b = math.atan(math.exp(-0.5 * logsnr_max))
    a = math.atan(math.exp(-0.5 * logsnr_min)) - b
    t = np.linspace(0.0, 1.0, num_scales, dtype=np.float64)
    return -2.0 * np.log(np.tan(a * t + b))


def linear_logsnr_schedule(
    num_scales: int, logsnr_min: float, logsnr_max: float
) -> np.ndarray:
    t = np.linspace(0.0, 1.0, num_scales, dtype=np.float64)
    return logsnr_max + (logsnr_min - logsnr_max) * t


# ---------------------------------------------------------------------------
# Elementwise training losses selected by config `loss_type`
# ---------------------------------------------------------------------------


def elementwise_loss(loss_type: str, pred: jax.Array, target: jax.Array) -> jax.Array:
    if loss_type == "l2":
        return (pred - target) ** 2
    if loss_type == "l1":
        return jnp.abs(pred - target)
    if loss_type == "huber":  # smooth_l1 with beta=1
        d = jnp.abs(pred - target)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    raise NotImplementedError(f"Loss function {loss_type} not implemented.")


# ---------------------------------------------------------------------------
# Discrete (DDPM) scheduler
# ---------------------------------------------------------------------------


class DiscreteNoiseScheduler(struct.PyTreeNode):
    """DDPM discrete-time forward process q(x_t | x_0) and its posterior.

    All derived alpha/beta tables are precomputed once (float64 -> float32),
    matching the reference's registered buffers (scheduler.py:185-224).
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    fixed_large_log_variance: jax.Array
    num_timesteps: int = struct.field(pytree_node=False)
    loss_type: str = struct.field(pytree_node=False, default="l2")

    # -- construction ------------------------------------------------------

    @classmethod
    def create(
        cls,
        schedule_type: str = "linear",
        num_scales: int = 1000,
        loss_type: str = "l2",
        min_beta: float = 1e-4,
        max_beta: float = 0.02,
        **_ignored,
    ) -> "DiscreteNoiseScheduler":
        betas = make_beta_schedule(schedule_type, num_scales, min_beta, max_beta)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas, axis=0)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        # "fixedlarge" variance: betas, with the t=0 entry replaced by the
        # posterior variance at t=1 (since beta_0's log would dominate).
        fixed_large = np.concatenate([[post_var[1]], betas[1:]])
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(ac),
            alphas_cumprod_prev=f32(ac_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - ac)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1.0)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(
                np.log(np.clip(post_var, 1e-20, None))
            ),
            posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
            posterior_mean_coef2=f32(
                (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)
            ),
            fixed_large_log_variance=f32(np.log(fixed_large)),
            num_timesteps=int(num_scales),
            loss_type=loss_type,
        )

    # -- protocol ----------------------------------------------------------

    def steps(self) -> int:
        return self.num_timesteps

    def continuous(self) -> bool:
        return False

    def sample_random_times(
        self, rng: jax.Array, batch_size: int
    ) -> Tuple[jax.Array, jax.Array]:
        t = jax.random.randint(rng, (batch_size,), 0, self.num_timesteps)
        return t, jnp.ones((batch_size,), dtype=jnp.float32)

    def q_sample(
        self, x_start: jax.Array, t: jax.Array, noise: jax.Array
    ) -> jax.Array:
        return (
            extract(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
            + extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.shape) * noise
        )

    def q_posterior(
        self, x_start: jax.Array, x_t: jax.Array, context: Dict
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        t = context["timestep"]
        mean = (
            extract(self.posterior_mean_coef1, t, x_t.shape) * x_start
            + extract(self.posterior_mean_coef2, t, x_t.shape) * x_t
        )
        variance = extract(self.posterior_variance, t, x_t.shape)
        log_variance = extract(self.posterior_log_variance_clipped, t, x_t.shape)
        return mean, variance, log_variance

    def variance_fixed_large(
        self, context: Dict, shape
    ) -> Tuple[jax.Array, jax.Array]:
        t = context["timestep"]
        variance = extract(self.betas, t, shape)
        # t=0 entry uses posterior variance (log of beta_0 is degenerate).
        log_variance = extract(self.fixed_large_log_variance, t, shape)
        return variance, log_variance

    def predict_x_from_epsilon(
        self, z: jax.Array, epsilon: jax.Array, context: Dict
    ) -> jax.Array:
        t = context["timestep"]
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, z.shape) * z
            - extract(self.sqrt_recipm1_alphas_cumprod, t, z.shape) * epsilon
        )

    def predict_x_from_v(self, z: jax.Array, v: jax.Array, context: Dict) -> jax.Array:
        t = context["timestep"]
        alpha_t = extract(self.sqrt_alphas_cumprod, t, z.shape)
        sigma_t = extract(self.sqrt_one_minus_alphas_cumprod, t, z.shape)
        return alpha_t * z - sigma_t * v

    def predict_v_from_x_and_epsilon(
        self, x: jax.Array, epsilon: jax.Array, t: jax.Array
    ) -> jax.Array:
        alpha_t = extract(self.sqrt_alphas_cumprod, t, x.shape)
        sigma_t = extract(self.sqrt_one_minus_alphas_cumprod, t, x.shape)
        return alpha_t * epsilon - sigma_t * x

    def predict_epsilon_from_x(
        self, z: jax.Array, x: jax.Array, context: Dict
    ) -> jax.Array:
        t = context["timestep"]
        alpha_t = extract(self.sqrt_alphas_cumprod, t, x.shape)
        sigma_t = extract(self.sqrt_one_minus_alphas_cumprod, t, x.shape)
        return (z - alpha_t * x) / sigma_t

    def logsnr_from_index(self, t: jax.Array) -> jax.Array:
        """logSNR(t) = log(alpha_bar / (1 - alpha_bar)) for integer t.

        Extension beyond the reference: lets DDIM-style logSNR samplers run
        on discrete schedules with arbitrary respaced step counts.
        """
        ac = jnp.take(self.alphas_cumprod, jnp.clip(t, 0, self.num_timesteps - 1))
        return jnp.log(ac) - jnp.log1p(-ac)


# ---------------------------------------------------------------------------
# Continuous (logSNR) scheduler
# ---------------------------------------------------------------------------


class ContinuousNoiseScheduler(struct.PyTreeNode):
    """Continuous-time VP scheduler parameterized by a logSNR table.

    gammas[i] tabulates logSNR(i / num_scales) for i in [0, num_scales]
    (num_scales+1 entries), matching reference scheduler.py:351-494. The
    posterior/variance math follows Progressive Distillation (2202.00512,
    Eq. 5) with expm1/log1mexp numerics (2107.00630, Sec. 4).
    """

    gammas: jax.Array  # (num_scales + 1,)
    alphas: jax.Array
    sigma2: jax.Array
    sqrt_sigma2: jax.Array
    num_timesteps: int = struct.field(pytree_node=False)
    loss_type: str = struct.field(pytree_node=False, default="l2")

    @classmethod
    def create(
        cls,
        num_scales: int = 1000,
        logsnr_schedule: str = "cosine",
        loss_type: str = "l2",
        logsnr_min: float = -20.0,
        logsnr_max: float = 20.0,
        **_ignored,
    ) -> "ContinuousNoiseScheduler":
        if logsnr_schedule == "cosine":
            gammas = cosine_logsnr_schedule(num_scales + 1, logsnr_min, logsnr_max)
        elif logsnr_schedule == "linear":
            gammas = linear_logsnr_schedule(num_scales + 1, logsnr_min, logsnr_max)
        else:
            raise NotImplementedError(
                f"Noise schedule {logsnr_schedule} not implemented."
            )
        sigma2 = 1.0 / (1.0 + np.exp(gammas))  # sigmoid(-gamma)
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            gammas=f32(gammas),
            alphas=f32(np.sqrt(1.0 - sigma2)),
            sigma2=f32(sigma2),
            sqrt_sigma2=f32(np.sqrt(sigma2)),
            num_timesteps=int(num_scales),
            loss_type=loss_type,
        )

    def steps(self) -> int:
        return self.num_timesteps

    def continuous(self) -> bool:
        return True

    def sample_random_times(
        self, rng: jax.Array, batch_size: int
    ) -> Tuple[jax.Array, jax.Array]:
        t = jax.random.uniform(rng, (batch_size,), dtype=jnp.float32)
        return t, jnp.ones_like(t)

    def logsnr(self, t: jax.Array) -> jax.Array:
        """Tabulated logSNR at continuous time t in [0, 1]."""
        t_idx = jnp.clip(
            (t * self.num_timesteps).astype(jnp.int32), 0, self.num_timesteps
        )
        return jnp.take(self.gammas, t_idx)

    def q_sample(
        self, x_start: jax.Array, t: jax.Array, noise: jax.Array
    ) -> jax.Array:
        t_idx = jnp.clip(
            (t * self.num_timesteps).astype(jnp.int32), 0, self.num_timesteps
        )
        return (
            extract(self.alphas, t_idx, x_start.shape) * x_start
            + extract(self.sqrt_sigma2, t_idx, x_start.shape) * noise
        )

    def variance_fixed_large(
        self, context: Dict, shape
    ) -> Tuple[jax.Array, jax.Array]:
        logsnr_t = broadcast_from_left(context["logsnr_t"], shape)
        logsnr_s = broadcast_from_left(context["logsnr_s"], shape)
        one_minus_r = -jnp.expm1(logsnr_t - logsnr_s)
        log_one_minus_r = log1mexp(logsnr_s - logsnr_t)
        var = one_minus_r * jax.nn.sigmoid(-logsnr_t)
        logvar = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_t)
        return var, logvar

    def q_posterior(
        self, x_start: jax.Array, x_t: jax.Array, context: Dict
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        z_t = x_t
        logsnr_s = broadcast_from_left(context["logsnr_s"], z_t.shape)
        logsnr_t = broadcast_from_left(context["logsnr_t"], z_t.shape)
        alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
        # alpha_s / alpha_t, stable at t -> 1.
        alpha_st = jnp.sqrt((1.0 + jnp.exp(-logsnr_t)) / (1.0 + jnp.exp(-logsnr_s)))
        r = jnp.exp(logsnr_t - logsnr_s)
        one_minus_r = -jnp.expm1(logsnr_t - logsnr_s)
        mean = r * alpha_st * z_t + one_minus_r * alpha_s * x_start
        log_one_minus_r = log1mexp(logsnr_s - logsnr_t)
        posterior_variance = one_minus_r * jax.nn.sigmoid(-logsnr_s)
        posterior_log_variance = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_s)
        # Floor the *variance* at 1e-20 (i.e. log-variance at log(1e-20)).
        # The reference clamps the log-variance itself to min=1e-20
        # (reference scheduler.py:494), which forces it to ~0 (unit
        # variance) since the true value is always negative — that quirk
        # corrupts the VLB true-posterior term, so we use the correct floor.
        return (
            mean,
            posterior_variance,
            jnp.clip(posterior_log_variance, math.log(1e-20), None),
        )

    def predict_x_from_epsilon(
        self, z: jax.Array, epsilon: jax.Array, context: Dict
    ) -> jax.Array:
        logsnr_t = broadcast_from_left(context["logsnr_t"], z.shape)
        return jnp.sqrt(1.0 + jnp.exp(-logsnr_t)) * (
            z - epsilon * jax.lax.rsqrt(1.0 + jnp.exp(logsnr_t))
        )

    def predict_x_from_v(self, z: jax.Array, v: jax.Array, context: Dict) -> jax.Array:
        logsnr_t = broadcast_from_left(context["logsnr_t"], z.shape)
        alpha_t = jnp.sqrt(jax.nn.sigmoid(logsnr_t))
        sigma_t = jnp.sqrt(jax.nn.sigmoid(-logsnr_t))
        return alpha_t * z - sigma_t * v

    def predict_v_from_x_and_epsilon(
        self, x: jax.Array, epsilon: jax.Array, t: jax.Array
    ) -> jax.Array:
        t_idx = jnp.clip(
            (t * self.num_timesteps).astype(jnp.int32), 0, self.num_timesteps
        )
        alpha_t = extract(self.alphas, t_idx, x.shape)
        sigma_t = extract(self.sqrt_sigma2, t_idx, x.shape)
        return alpha_t * epsilon - sigma_t * x

    def predict_epsilon_from_x(
        self, z: jax.Array, x: jax.Array, context: Dict
    ) -> jax.Array:
        logsnr_t = broadcast_from_left(context["logsnr_t"], z.shape)
        return jnp.sqrt(1.0 + jnp.exp(logsnr_t)) * (
            z - x * jax.lax.rsqrt(1.0 + jnp.exp(-logsnr_t))
        )


# ---------------------------------------------------------------------------
# Rectified-flow scheduler
# ---------------------------------------------------------------------------


class DiscreteRectifiedFlowNoiseScheduler(struct.PyTreeNode):
    """Rectified-flow interpolant x_t = t*x0 + (1-t)*eps.

    t=1 is data, t=0 is noise (reference convention, scheduler.py:572-657).
    Time distributions: uniform, uniform-clipped (to [eps, max]), or
    logit-normal (SD3-style).
    """

    num_steps: int = struct.field(pytree_node=False)
    max_time: float = struct.field(pytree_node=False, default=1.0)
    epsilon: float = struct.field(pytree_node=False, default=1e-3)
    distribution: str = struct.field(pytree_node=False, default="uniform-clipped")
    loss_type: str = struct.field(pytree_node=False, default="l2")

    @classmethod
    def create(
        cls,
        steps: int = 1000,
        max_time: float = 1.0,
        distribution: str = "uniform-clipped",
        loss_type: str = "l2",
        **_ignored,
    ) -> "DiscreteRectifiedFlowNoiseScheduler":
        assert distribution in ("uniform", "uniform-clipped", "logit-normal")
        eps = 1e-3 if distribution == "uniform-clipped" else 0.0
        return cls(
            num_steps=int(steps),
            max_time=float(max_time),
            epsilon=eps,
            distribution=distribution,
            loss_type=loss_type,
        )

    def steps(self) -> int:
        return self.num_steps

    def continuous(self) -> bool:
        return False

    def sample_random_times(
        self, rng: jax.Array, batch_size: int
    ) -> Tuple[jax.Array, jax.Array]:
        if self.distribution == "logit-normal":
            u = jax.random.normal(rng, (batch_size,), dtype=jnp.float32)
            base = jax.nn.sigmoid(u)
        else:
            base = jax.random.uniform(rng, (batch_size,), dtype=jnp.float32)
        t = base * (self.max_time - self.epsilon) + self.epsilon
        return t, jnp.ones_like(t)

    def q_sample(
        self, x_start: jax.Array, t: jax.Array, noise: jax.Array
    ) -> jax.Array:
        t_expanded = broadcast_from_left(t, x_start.shape)
        return t_expanded * x_start + (1.0 - t_expanded) * noise


# ---------------------------------------------------------------------------
# Config-compatible factories (registry targets)
# ---------------------------------------------------------------------------
# The YAML `target:` keys name these callables; importance_sampler sub-configs
# are consumed by the diffusion process, not the scheduler, so factories
# accept and ignore them.


def _strip(config_kwargs: Dict) -> Dict:
    config_kwargs.pop("importance_sampler", None)
    return config_kwargs


def discrete_noise_scheduler(**kwargs) -> DiscreteNoiseScheduler:
    return DiscreteNoiseScheduler.create(**_strip(kwargs))


def continuous_noise_scheduler(**kwargs) -> ContinuousNoiseScheduler:
    return ContinuousNoiseScheduler.create(**_strip(kwargs))


def rectified_flow_noise_scheduler(**kwargs) -> DiscreteRectifiedFlowNoiseScheduler:
    return DiscreteRectifiedFlowNoiseScheduler.create(**_strip(kwargs))
