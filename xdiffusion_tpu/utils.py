"""Tensor/math utilities shared across the framework.

Pure-jnp equivalents of the reference math helpers
(/root/reference/xdiffusion/utils.py:67-531), designed to be jit/scan safe:
everything here is a pure function of jax arrays with static shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def extract(a: jax.Array, t: jax.Array, x_shape: Sequence[int]) -> jax.Array:
    """Gather per-timestep constants and broadcast against an x-shaped batch.

    a: (T,) table of constants; t: (B,) integer timesteps. Returns
    a[t] reshaped to (B, 1, 1, ...) so it broadcasts against x of
    shape x_shape. (Reference behavior: utils.py:67.)
    """
    b = t.shape[0]
    out = jnp.take(a, t, axis=0)
    return out.reshape(b, *((1,) * (len(x_shape) - 1)))


def broadcast_from_left(x: jax.Array, shape: Sequence[int]) -> jax.Array:
    """Broadcast x against `shape` by appending singleton dims on the right.

    (Reference behavior: utils.py:343.)
    """
    x = jnp.asarray(x)
    ndim_in = x.ndim
    ndim_out = len(shape)
    assert ndim_out >= ndim_in
    return jnp.broadcast_to(x.reshape(x.shape + (1,) * (ndim_out - ndim_in)), shape)


def log1mexp(x: jax.Array) -> jax.Array:
    """Numerically stable log(1 - exp(-x)) for x > 0.

    Algorithm from Maechler (2012), as used for the continuous-time
    posterior variance (reference: scheduler.py:436-494 call sites).
    """
    x = jnp.asarray(x)
    return jnp.where(
        x > jnp.log(2.0),
        jnp.log1p(-jnp.exp(-x)),
        jnp.log(-jnp.expm1(-x)),
    )


def normalize_to_neg_one_to_one(x: jax.Array) -> jax.Array:
    """[0,1] pixels -> [-1,1] model space."""
    return x * 2.0 - 1.0


def unnormalize_to_zero_to_one(x: jax.Array) -> jax.Array:
    """[-1,1] model space -> [0,1] pixels."""
    return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)


def dynamic_thresholding(x: jax.Array, p: float = 0.995, c: float = 1.7) -> jax.Array:
    """Imagen dynamic thresholding of a predicted x0 batch.

    At each sampling step, set s to the p-th percentile of |x0| per example;
    if s > 1, clip to [-s, s] and rescale by s (capped at c).
    (Reference behavior: utils.py:379.)
    """
    b = x.shape[0]
    flat = jnp.abs(x.reshape(b, -1))
    s = jnp.quantile(flat, p, axis=-1)
    s = jnp.clip(s, 1.0, c)
    s = s.reshape(b, *((1,) * (x.ndim - 1)))
    return jnp.clip(x, -s, s) / s


def prob_mask_like(rng: jax.Array, shape, prob: float) -> jax.Array:
    """Boolean mask where each element is True with probability `prob`."""
    if prob == 1.0:
        return jnp.ones(shape, dtype=bool)
    if prob == 0.0:
        return jnp.zeros(shape, dtype=bool)
    return jax.random.uniform(rng, shape) < prob


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal gaussians (reference: utils.py:101)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized (256-bin) gaussian, for VLB terms.

    x is assumed to be scaled to [-1, 1] from uint8 data.
    (Reference behavior: utils.py:143.)
    """
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, 1e-12, None)),
        ),
    )
    return log_probs


def mean_flat(x: jax.Array) -> jax.Array:
    """Mean over all non-batch dimensions: (B, ...) -> (B,)."""
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
