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
        out, lse = _flash_forward(q, k, v, scale)
    expected = _xla_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=2e-3, rtol=2e-3
    )
    # The emitted logsumexp must match the dense computation.
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    want_lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(want_lse), atol=1e-2, rtol=1e-3
    )


def test_flash_backward_pallas_head_dim_64():
    """The Pallas backward at the video-transformer operating point
    (head_dim 64, q/k block tiling active): gradients match the dense
    reference."""
    from jax.experimental.pallas import tpu as pltpu

    from xdiffusion_tpu.ops.flash_attention import flash_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(9), b=1, h=2, s=512, d=64)
    scale = 64**-0.5

    def loss_kernel(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale=scale) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


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


def test_bsc_kernel_interpret_matches_bshd():
    """The (B, S, C) fused attention kernel (interpret mode) matches the
    head-batched einsum path."""
    from jax.experimental.pallas import tpu as pltpu

    from xdiffusion_tpu.ops.attention import attention_bshd
    from xdiffusion_tpu.ops.flash_attention import _bsc_forward

    key = jax.random.PRNGKey(3)
    b, s, c, heads = 4, 64, 128, 2
    d = c // heads
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, s, c), jnp.float32)
        for i in range(3)
    )
    with pltpu.force_tpu_interpret_mode():
        out = _bsc_forward(q, k, v, heads, d**-0.5)
    expected = attention_bshd(
        q.reshape(b, s, heads, d),
        k.reshape(b, s, heads, d),
        v.reshape(b, s, heads, d),
        scale=d**-0.5,
    ).reshape(b, s, c)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=2e-5, rtol=2e-5
    )


def test_bsc_kernel_cross_attention_shapes():
    """Sq != Sk (encoder kv concatenated ahead of the spatial tokens)."""
    from jax.experimental.pallas import tpu as pltpu

    from xdiffusion_tpu.ops.attention import attention_bshd
    from xdiffusion_tpu.ops.flash_attention import _bsc_forward

    key = jax.random.PRNGKey(4)
    b, sq, sk, c, heads = 2, 64, 96, 128, 2
    d = c // heads
    q = jax.random.normal(jax.random.fold_in(key, 0), (b, sq, c), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, sk, c), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, sk, c), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = _bsc_forward(q, k, v, heads, d**-0.5)
    expected = attention_bshd(
        q.reshape(b, sq, heads, d),
        k.reshape(b, sk, heads, d),
        v.reshape(b, sk, heads, d),
        scale=d**-0.5,
    ).reshape(b, sq, c)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=2e-5, rtol=2e-5
    )


def test_attention_qkv_gradients_match_einsum():
    """custom_vjp backward of the fused path equals einsum-path autodiff."""
    from xdiffusion_tpu.ops.attention import attention_bshd
    from xdiffusion_tpu.ops.flash_attention import short_attention_bsc

    key = jax.random.PRNGKey(5)
    b, s, c, heads = 2, 32, 64, 2
    d = c // heads
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, s, c), jnp.float32)
        for i in range(3)
    )

    def ref_loss(q, k, v):
        out = attention_bshd(
            q.reshape(b, s, heads, d),
            k.reshape(b, s, heads, d),
            v.reshape(b, s, heads, d),
            scale=d**-0.5,
        )
        return jnp.sum(out**2)

    # The custom_vjp backward recomputes through the einsum path, so its
    # gradients must match exactly regardless of which forward ran.
    from jax.experimental.pallas import tpu as pltpu

    def fused_loss(q, k, v):
        return jnp.sum(short_attention_bsc(q, k, v, heads, d**-0.5) ** 2)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_fast_group_norm_matches_flax():
    """FastGroupNorm == nn.GroupNorm for 4D and 5D activations, with and
    without fused SiLU / adaptive scale-shift."""
    import flax.linen as nn

    from xdiffusion_tpu.layers.resnet import FastGroupNorm

    key = jax.random.PRNGKey(6)
    for shape in [(2, 8, 8, 64), (2, 3, 8, 8, 64)]:
        x = jax.random.normal(key, shape, jnp.float32)
        sc = jax.random.normal(jax.random.fold_in(key, 1), (64,))
        bi = jax.random.normal(jax.random.fold_in(key, 2), (64,))
        p = {"params": {"scale": sc, "bias": bi}}
        got = FastGroupNorm(num_groups=32).apply(p, x)
        # FastGroupNorm defaults to the torch eps (1e-5) for imported-
        # checkpoint fidelity; pin flax's GroupNorm to the same.
        want = nn.GroupNorm(num_groups=32, epsilon=1e-5).apply(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

        got_silu = FastGroupNorm(num_groups=32, silu=True).apply(p, x)
        np.testing.assert_allclose(
            np.asarray(got_silu), np.asarray(jax.nn.silu(want)), atol=1e-5
        )

        ts = jax.random.normal(jax.random.fold_in(key, 3), (shape[0], 64))
        tsh = jax.random.normal(jax.random.fold_in(key, 4), (shape[0], 64))
        got_ss = FastGroupNorm(num_groups=32, silu=True).apply(
            p, x, t_scale=ts, t_shift=tsh
        )
        bshape = (shape[0],) + (1,) * (x.ndim - 2) + (64,)
        want_ss = jax.nn.silu(
            want * (1.0 + ts.reshape(bshape)) + tsh.reshape(bshape)
        )
        np.testing.assert_allclose(
            np.asarray(got_ss), np.asarray(want_ss), atol=1e-5
        )


def test_fast_group_norm_gradients_finite():
    from xdiffusion_tpu.layers.resnet import FastGroupNorm

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 64))
    p = FastGroupNorm(num_groups=32).init(jax.random.PRNGKey(8), x)

    def loss(p, x):
        return jnp.sum(FastGroupNorm(num_groups=32, silu=True).apply(p, x) ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
    assert np.all(np.isfinite(np.asarray(gx)))
    for leaf in jax.tree_util.tree_leaves(gp):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fused_resblock_kernel_matches_xla():
    """affine+SiLU+conv3x3(+residual) Pallas kernel vs the XLA reference
    (interpret mode), all four (silu, residual) combinations."""
    from jax.experimental.pallas import tpu as pltpu

    from xdiffusion_tpu.ops.fused_resblock import _pallas_call, _xla_impl

    key = jax.random.PRNGKey(0)
    b, h, w, c, co = 2, 8, 8, 128, 128
    x = jax.random.normal(key, (b, h, w, c), jnp.float32)
    a = jax.random.normal(jax.random.fold_in(key, 1), (b, c)) * 0.2 + 1.0
    off = jax.random.normal(jax.random.fold_in(key, 2), (b, c)) * 0.1
    kw = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, c, co)) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 4), (co,)) * 0.1
    res = jax.random.normal(jax.random.fold_in(key, 5), (b, h, w, co))

    for silu in (True, False):
        for r in (None, res):
            want = _xla_impl(x, a, off, kw, bias, r, silu)
            with pltpu.force_tpu_interpret_mode():
                got = _pallas_call(x, a, off, kw, bias, r, silu)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4,
                err_msg=f"silu={silu} residual={r is not None}",
            )


def test_fused_resblock_boundary_padding_exact():
    """The flat-roll + mask construction must reproduce 'SAME' zero
    padding exactly at every image edge (where the roll wraps)."""
    from jax.experimental.pallas import tpu as pltpu

    from xdiffusion_tpu.ops.fused_resblock import _pallas_call, _xla_impl

    # Ones activation + identity affine: any padding mistake shifts edge
    # sums by a whole tap.
    b, h, w, c, co = 1, 8, 16, 128, 128
    x = jnp.ones((b, h, w, c), jnp.float32)
    a = jnp.ones((b, c))
    off = jnp.zeros((b, c))
    kw = jnp.ones((3, 3, c, co), jnp.float32) / (9 * c)
    bias = jnp.zeros((co,))
    want = _xla_impl(x, a, off, kw, bias, None, False)
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_call(x, a, off, kw, bias, None, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


def test_fused_resblock_gradients_match_unfused():
    """custom_vjp gradients == differentiating the unfused composition."""
    from xdiffusion_tpu.ops.fused_resblock import _xla_impl, affine_silu_conv3x3

    key = jax.random.PRNGKey(3)
    b, h, w, c, co = 2, 4, 4, 8, 8  # XLA fallback path on CPU
    x = jax.random.normal(key, (b, h, w, c), jnp.float32)
    a = jax.random.normal(jax.random.fold_in(key, 1), (b, c)) * 0.2 + 1.0
    off = jax.random.normal(jax.random.fold_in(key, 2), (b, c)) * 0.1
    kw = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, c, co)) * 0.1
    bias = jnp.zeros((co,))
    res = jax.random.normal(jax.random.fold_in(key, 4), (b, h, w, co))

    def loss_fused(ops):
        return jnp.sum(affine_silu_conv3x3(*ops, residual=res) ** 2)

    def loss_ref(ops):
        return jnp.sum(_xla_impl(*ops, res, True) ** 2)

    ops = (x, a, off, kw, bias)
    g_fused = jax.grad(loss_fused)(ops)
    g_ref = jax.grad(loss_ref)(ops)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-4
        )

    # d/d(residual) flows too.
    gres = jax.grad(
        lambda r: jnp.sum(affine_silu_conv3x3(x, a, off, kw, bias,
                                              residual=r) ** 2)
    )(res)
    gres_ref = jax.grad(
        lambda r: jnp.sum(_xla_impl(x, a, off, kw, bias, r, True) ** 2)
    )(res)
    np.testing.assert_allclose(
        np.asarray(gres), np.asarray(gres_ref), atol=1e-4, rtol=1e-4
    )


def test_fused_resblock_integration_matches_unfused():
    """ResnetBlock{BigGAN,DDPM} with the fused interior (monkeypatched
    gate) must match the unfused block with identical params — both
    conditioning modes, with and without channel change — and gradients
    must flow."""
    import xdiffusion_tpu.layers.resnet as resnet_mod

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 64))
    ctx = {"timestep_embedding": jax.random.normal(
        jax.random.fold_in(key, 1), (2, 32))}

    for cls in (resnet_mod.ResnetBlockBigGAN, resnet_mod.ResnetBlockDDPM):
        for ss in (True, False):
            for dim_out in (64, 128):
                blk = cls(dim_out=dim_out, use_scale_shift_norm=ss)
                p = blk.init(jax.random.PRNGKey(2), x, ctx)
                want = blk.apply(p, x, ctx)

                resnet_mod._FUSED_RESBLOCK = True
                try:
                    got = blk.apply(p, x, ctx)
                    g = jax.grad(
                        lambda pp: jnp.sum(blk.apply(pp, x, ctx) ** 2)
                    )(p)
                finally:
                    resnet_mod._FUSED_RESBLOCK = False
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
                    err_msg=f"{cls.__name__} ss={ss} dim_out={dim_out}",
                )
                for leaf in jax.tree_util.tree_leaves(g):
                    assert np.all(np.isfinite(np.asarray(leaf)))

    # Param trees are interchangeable: init under the fused gate produces
    # the same structure.
    resnet_mod._FUSED_RESBLOCK = True
    try:
        blk = resnet_mod.ResnetBlockBigGAN(dim_out=128)
        p_fused = blk.init(jax.random.PRNGKey(2), x, ctx)
    finally:
        resnet_mod._FUSED_RESBLOCK = False
    p_ref = resnet_mod.ResnetBlockBigGAN(dim_out=128).init(
        jax.random.PRNGKey(2), x, ctx
    )
    assert jax.tree_util.tree_structure(p_fused) == \
        jax.tree_util.tree_structure(p_ref)
    for a, b in zip(jax.tree_util.tree_leaves(p_fused),
                    jax.tree_util.tree_leaves(p_ref)):
        assert a.shape == b.shape


def test_group_norm_coefficients_channel_shift():
    """Closed-form channel_shift fold == materializing x + shift."""
    from xdiffusion_tpu.ops.norm import group_norm_coefficients

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 8, 8, 64))
    p = jax.random.normal(jax.random.fold_in(key, 1), (2, 64))
    sc = jax.random.normal(jax.random.fold_in(key, 2), (64,)) * 0.3 + 1.0
    bi = jax.random.normal(jax.random.fold_in(key, 3), (64,)) * 0.2

    a_f, off_f = group_norm_coefficients(x, sc, bi, 32, channel_shift=p)
    xs = x + p[:, None, None, :]
    a_m, off_m = group_norm_coefficients(xs, sc, bi, 32)
    # Folded application on the UNSHIFTED x equals applying the
    # materialized coefficients to the shifted input.
    got = x * a_f[:, None, None, :] + off_f[:, None, None, :]
    want = xs * a_m[:, None, None, :] + off_m[:, None, None, :]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_fused_resblock_video_shared_stats_matches_unfused():
    """Video blocks (frames folded into batch, shared GroupNorm stats via
    stat_frames) take the fused interior too — scale-shift conditioning
    fully fused; additive conditioning fuses conv1 only (conv2 falls back
    to the unfused tail). Both must match the unfused block exactly."""
    import xdiffusion_tpu.layers.resnet as resnet_mod

    key = jax.random.PRNGKey(9)
    frames = 4
    x = jax.random.normal(key, (2 * frames, 8, 8, 64))  # (B*F, H, W, C)
    ctx = {"timestep_embedding": jax.random.normal(
        jax.random.fold_in(key, 1), (2 * frames, 32))}

    for ss in (True, False):
        blk = resnet_mod.ResnetBlockBigGAN(
            dim_out=64, use_scale_shift_norm=ss, stat_frames=frames,
            emb_mlp_layers=2,
        )
        p = blk.init(jax.random.PRNGKey(2), x, ctx)
        want = blk.apply(p, x, ctx)
        resnet_mod._FUSED_RESBLOCK = True
        try:
            got = blk.apply(p, x, ctx)
        finally:
            resnet_mod._FUSED_RESBLOCK = False
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
            err_msg=f"video ss={ss}",
        )
