"""Op dispatcher + Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.ops.attention import _xla_attention, dot_product_attention


def _rand_qkv(key, b=2, h=2, s=256, d=128, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, s, d), dtype=dtype)
    k = jax.random.normal(k2, (b, h, s, d), dtype=dtype)
    v = jax.random.normal(k3, (b, h, s, d), dtype=dtype)
    return q, k, v


def test_xla_attention_matches_naive():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), s=64, d=32)
    out = _xla_attention(q, k, v, scale=32**-0.5)
    # naive reference
    logits = (q @ jnp.swapaxes(k, -1, -2)) * (32**-0.5)
    expected = jax.nn.softmax(logits, axis=-1) @ v
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_causal_masking():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), s=16, d=8)
    out = dot_product_attention(q, k, v, is_causal=True, force_xla=True)
    # First query position attends only to first key: equals v[..., 0, :].
    np.testing.assert_allclose(
        np.asarray(out[..., 0, :]), np.asarray(v[..., 0, :]), atol=1e-5
    )


def test_flash_kernel_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from xdiffusion_tpu.ops.flash_attention import _flash_forward

    q, k, v = _rand_qkv(jax.random.PRNGKey(2), b=1, h=2, s=512, d=128)
    scale = 128**-0.5
    with pltpu.force_tpu_interpret_mode():
        out = _flash_forward(q, k, v, scale)
    expected = _xla_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=2e-3, rtol=2e-3
    )


def test_flash_backward_gradients_match():
    from jax.experimental.pallas import tpu as pltpu

    from xdiffusion_tpu.ops.flash_attention import flash_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b=1, h=1, s=256, d=128)
    scale = 128**-0.5

    def loss_kernel(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale=scale) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_group_norm_silu_pallas_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from xdiffusion_tpu.ops.group_norm import (
        _pallas_group_norm_silu,
        _xla_group_norm_silu,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128))
    scale = jax.random.normal(jax.random.PRNGKey(1), (128,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    expected = _xla_group_norm_silu(x, scale, bias, 32, 1e-5, True)
    with pltpu.force_tpu_interpret_mode():
        out = _pallas_group_norm_silu(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=2e-5, rtol=2e-5
    )


def test_group_norm_xla_matches_flax():
    from flax import linen as nn

    from xdiffusion_tpu.ops.group_norm import _xla_group_norm_silu

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 64))
    gn = nn.GroupNorm(num_groups=16)
    params = gn.init(jax.random.PRNGKey(1), x)
    expected = gn.apply(params, x)
    out = _xla_group_norm_silu(
        x,
        params["params"]["scale"],
        params["params"]["bias"],
        16,
        1e-5,  # flax default eps is 1e-6; tolerance below covers it
        apply_silu=False,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=2e-3, rtol=2e-3
    )
