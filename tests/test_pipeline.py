"""GPipe pipeline-parallel engine (parallel/pipeline.py): the microbatch
circulation over the 'pipeline' mesh axis must be numerically equivalent
to running the block stack sequentially — forward AND backward — and the
DiT integration must produce the same score/gradients as the plain loop.
The reference has no pipeline mode (single-GPU DDP only); this is the
TPU-native scaling path, tested on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xdiffusion_tpu.parallel import make_mesh
from xdiffusion_tpu.parallel.pipeline import (
    gpipe_blocks,
    pipeline_parallel,
    stack_block_params,
)


def _affine_block(p, x, c):
    # Shape-preserving toy block with real per-block params and a
    # conditioning contribution, so misrouted microbatches/stages and
    # wrong (t - s) conditioning indices are both detectable.
    return jnp.tanh(x * p["w"] + p["b"]) + c[:, None, :]


def _stacked_affine(rng, depth, hidden):
    keys = jax.random.split(rng, depth)
    return stack_block_params(
        [
            {
                "w": jax.random.normal(k, (hidden,)) * 0.3 + 1.0,
                "b": jax.random.normal(jax.random.fold_in(k, 1), (hidden,)) * 0.1,
            }
            for k in keys
        ]
    )


def _sequential(stacked, x, c):
    depth = stacked["w"].shape[0]
    for i in range(depth):
        x = _affine_block(
            jax.tree_util.tree_map(lambda a: a[i], stacked), x, c
        )
    return x


@pytest.mark.parametrize("microbatches", [None, 1, 2, 4])
@pytest.mark.parametrize("shape", [(2, 4), (1, 8)])
def test_gpipe_matches_sequential_forward(shape, microbatches):
    mesh = make_mesh(shape=shape, axis_names=("data", "pipeline"))
    depth, hidden, batch, tokens = 8, 16, 8, 4
    stacked = _stacked_affine(jax.random.PRNGKey(0), depth, hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, tokens, hidden))
    c = jax.random.normal(jax.random.PRNGKey(2), (batch, hidden))

    want = _sequential(stacked, x, c)
    got = gpipe_blocks(
        _affine_block, stacked, x, c, mesh, num_microbatches=microbatches
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gpipe_matches_sequential_gradients():
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "pipeline"))
    depth, hidden, batch, tokens = 4, 8, 8, 4
    stacked = _stacked_affine(jax.random.PRNGKey(0), depth, hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, tokens, hidden))
    c = jax.random.normal(jax.random.PRNGKey(2), (batch, hidden))
    target = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    def loss_seq(p, xx):
        return jnp.mean((_sequential(p, xx, c) - target) ** 2)

    def loss_pipe(p, xx):
        out = gpipe_blocks(_affine_block, p, xx, c, mesh)
        return jnp.mean((out - target) ** 2)

    g_seq = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(stacked, x)
    g_pipe = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_seq), jax.tree_util.tree_leaves(g_pipe)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_gpipe_rejects_indivisible():
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "pipeline"))
    stacked = _stacked_affine(jax.random.PRNGKey(0), 6, 8)  # 6 % 4 != 0
    x = jnp.zeros((8, 4, 8))
    c = jnp.zeros((8, 8))
    with pytest.raises(ValueError, match="stages"):
        gpipe_blocks(_affine_block, stacked, x, c, mesh)
    stacked = _stacked_affine(jax.random.PRNGKey(0), 8, 8)
    with pytest.raises(ValueError, match="microbatches"):
        gpipe_blocks(
            _affine_block, stacked, jnp.zeros((6, 4, 8)), jnp.zeros((6, 8)),
            mesh, num_microbatches=4,  # local batch 3 % 4 != 0
        )


def _tiny_dit_model():
    import copy

    import yaml

    from xdiffusion_tpu.config import DotConfig
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM

    cfg = yaml.safe_load(open("configs/image/mnist/dit.yaml"))
    p = cfg["diffusion"]["score_network"]["params"]
    p.update(
        {"hidden_size": 32, "depth": 4, "num_heads": 2, "patch_size": 8,
         "dropout": 0.0}
    )
    p["conditioning"]["projections"]["timestep"]["params"]["hidden_size"] = 32
    p["conditioning"]["projections"]["classes"]["params"]["hidden_size"] = 32
    cfg["diffusion"]["noise_scheduler"]["params"]["num_scales"] = 8
    cfg["diffusion"]["noise_scheduler"]["params"]["schedule_type"] = "cosine"
    return GaussianDiffusion_DDPM(DotConfig(copy.deepcopy(cfg)))


def test_dit_pipeline_forward_matches_plain(monkeypatch):
    monkeypatch.chdir(__import__("pathlib").Path(__file__).parent.parent)
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "pipeline"))
    model = _tiny_dit_model()
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 1))
    ctx = {
        "timestep": jnp.arange(8) % 8,
        "classes": jnp.arange(8, dtype=jnp.int32) % 10,
    }

    want = model.predict_score(params, x, dict(ctx))
    with pipeline_parallel(mesh):
        got = model.predict_score(params, x, dict(ctx))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5
    )


def test_dit_pipeline_train_step_matches_plain(monkeypatch):
    """One full train step (loss+grads+optimizer) under DP x PP must match
    the plain-mesh step bit-for-tolerance — the dryrun_multichip contract."""
    monkeypatch.chdir(__import__("pathlib").Path(__file__).parent.parent)
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import (
        create_train_state,
        make_train_step,
        shard_batch,
    )

    model = _tiny_dit_model()
    params = model.init_params(jax.random.PRNGKey(0))
    tx = default_optimizer().build()
    batch_np = {
        "images": np.random.default_rng(0)
        .uniform(size=(8, 32, 32, 1))
        .astype(np.float32),
        "classes": np.arange(8, dtype=np.int32) % 10,
    }

    base_mesh = make_mesh(shape=(2, 4))
    base_state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tx
    )
    base_step = make_train_step(model, tx, base_mesh)
    _, base_metrics = base_step(
        base_state, shard_batch(batch_np, base_mesh), jax.random.PRNGKey(1)
    )

    mesh = make_mesh(shape=(2, 4), axis_names=("data", "pipeline"))
    with pipeline_parallel(mesh, num_microbatches=2):
        state = create_train_state(params, tx)
        step = make_train_step(model, tx, mesh)
        _, metrics = step(
            state, shard_batch(batch_np, mesh), jax.random.PRNGKey(1)
        )
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(base_metrics["loss"]), rtol=1e-4
    )


# ---------------------------------------------------------------------------
# GPipe generalization (round 5): PixArt / SD3 / Flux pipelined stacks and
# dropout-rng threading through the pipelined scan.


def test_pixart_pipeline_forward_matches_plain():
    from tests.test_pixart import tiny_pixart_config
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM

    mesh = make_mesh(shape=(4, 2), axis_names=("data", "pipeline"))
    model = GaussianDiffusion_DDPM(tiny_pixart_config())
    net = model.score_network()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 1))
    ctx = {
        "timestep": jnp.arange(8) % 8,
        "text_tokens": jnp.ones((8, 12), dtype=jnp.int32),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x, dict(ctx))
    want = net.apply(params, x, dict(ctx))
    with pipeline_parallel(mesh):
        got = net.apply(params, x, dict(ctx))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sd3_pipeline_forward_matches_plain():
    from tests.test_sd3 import tiny_sd3_config
    from xdiffusion_tpu.config import get_obj_from_str

    from xdiffusion_tpu.config import DotConfig

    raw = tiny_sd3_config().to_dict()
    # 3 layers -> 2 homogeneous body blocks (pipelined over 2 stages) +
    # the final context_pre_only block (runs unpipelined).
    sn = raw["diffusion"]["score_network"]
    sn["params"]["num_layers"] = 3
    net = get_obj_from_str(
        sn["target"].replace("xdiffusion.", "xdiffusion_tpu.")
    )(config=DotConfig(sn["params"]))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 1))
    ctx = {
        "timestep": jnp.linspace(0.1, 0.9, 8),
        "text_embeddings": jax.random.normal(jax.random.PRNGKey(1), (8, 8, 64)),
        "pooled_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(2), (8, 48)
        ),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(3), x, dict(ctx))
    want = net.apply(params, x, dict(ctx))
    mesh = make_mesh(shape=(4, 2), axis_names=("data", "pipeline"))
    with pipeline_parallel(mesh):
        got = net.apply(params, x, dict(ctx))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flux_pipeline_forward_matches_plain():
    from tests.test_zoo import flux_cfg
    from xdiffusion_tpu.config import DotConfig
    from xdiffusion_tpu.score_networks.flux import Flux

    raw = flux_cfg().to_dict()
    raw["depth"] = 2
    raw["depth_single_blocks"] = 2
    net = Flux(config=DotConfig(raw))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 1))
    ctx = {
        "timestep": jnp.linspace(0.05, 0.95, 8),
        "t5_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(1), (8, 6, 48)
        ),
        "clip_text_embeddings": jax.random.normal(
            jax.random.PRNGKey(2), (8, 32)
        ),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(3), x, ctx)
    want = net.apply(params, x, ctx)
    mesh = make_mesh(shape=(4, 2), axis_names=("data", "pipeline"))
    with pipeline_parallel(mesh):
        got = net.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _tiny_dit_dropout_model():
    import copy

    import yaml

    from xdiffusion_tpu.config import DotConfig
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM

    cfg = yaml.safe_load(open("configs/image/mnist/dit.yaml"))
    p = cfg["diffusion"]["score_network"]["params"]
    p.update(
        {"hidden_size": 32, "depth": 4, "num_heads": 2, "patch_size": 8,
         "dropout": 0.3}
    )
    p["conditioning"]["projections"]["timestep"]["params"]["hidden_size"] = 32
    p["conditioning"]["projections"]["classes"]["params"]["hidden_size"] = 32
    cfg["diffusion"]["noise_scheduler"]["params"]["num_scales"] = 8
    cfg["diffusion"]["noise_scheduler"]["params"]["schedule_type"] = "cosine"
    return GaussianDiffusion_DDPM(DotConfig(copy.deepcopy(cfg)))


def test_dit_pipeline_dropout_semantics(monkeypatch):
    """Dropout THREADS through the pipelined scan (round-4 gap: it was
    silently forced off): training mode is stochastic but deterministic in
    the key, and eval mode still matches the plain path exactly."""
    monkeypatch.chdir(__import__("pathlib").Path(__file__).parent.parent)
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "pipeline"))
    model = _tiny_dit_dropout_model()
    net = model.score_network()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 1))
    ctx = {
        "timestep": jnp.arange(8) % 8,
        "classes": jnp.arange(8, dtype=jnp.int32) % 10,
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, dict(ctx))
    # adaLN-Zero initializes every block as identity (zero gates), which
    # would multiply the dropped activations by 0 and hide dropout —
    # perturb all params so the blocks actually contribute.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [
            l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ],
    )

    # Eval (deterministic): pipelined == plain.
    want = net.apply(params, x, dict(ctx))
    with pipeline_parallel(mesh):
        got_eval = net.apply(params, x, dict(ctx))
        # Train (dropout on): same key -> identical, new key -> different,
        # and different from eval.
        key = jax.random.PRNGKey(7)
        t1 = net.apply(params, x, dict(ctx), False, rngs={"dropout": key})
        t2 = net.apply(params, x, dict(ctx), False, rngs={"dropout": key})
        t3 = net.apply(
            params, x, dict(ctx), False,
            rngs={"dropout": jax.random.PRNGKey(8)},
        )
    np.testing.assert_allclose(np.asarray(got_eval), np.asarray(want), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.allclose(np.asarray(t1), np.asarray(t3), atol=1e-6)
    assert not np.allclose(np.asarray(t1), np.asarray(want), atol=1e-6)


def test_dit_pipeline_dropout_train_step(monkeypatch):
    """Full train step with dropout enabled under DP x PP: runs, finite,
    and grads flow (the reference-parity dropout semantics survive PP)."""
    monkeypatch.chdir(__import__("pathlib").Path(__file__).parent.parent)
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import (
        create_train_state,
        make_train_step,
        shard_batch,
    )

    model = _tiny_dit_dropout_model()
    params = model.init_params(jax.random.PRNGKey(0))
    tx = default_optimizer().build()
    batch_np = {
        "images": np.random.default_rng(0)
        .uniform(size=(8, 32, 32, 1))
        .astype(np.float32),
        "classes": np.arange(8, dtype=np.int32) % 10,
    }
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "pipeline"))
    with pipeline_parallel(mesh, num_microbatches=2):
        state = create_train_state(params, tx)
        step = make_train_step(model, tx, mesh)
        new_state, metrics = step(
            state, shard_batch(batch_np, mesh), jax.random.PRNGKey(1)
        )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0.0
