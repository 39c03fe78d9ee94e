"""Multi-device (8 virtual CPU) mesh tests: DP-sharded train step, FSDP
parameter sharding rules, EMA tracking."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
from xdiffusion_tpu.optim import default_optimizer
from xdiffusion_tpu.parallel import (
    create_train_state,
    fsdp_param_shardings,
    make_mesh,
    make_train_step,
    shard_batch,
)

from test_diffusion import tiny_config


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_sharded_train_step_runs_and_learns():
    model = GaussianDiffusion_DDPM(tiny_config())
    mesh = make_mesh()  # (8, 1): pure DP
    params = model.init_params(jax.random.PRNGKey(0))
    tx = default_optimizer().build()
    state = create_train_state(params, tx, ema=True)
    step = make_train_step(model, tx, mesh, ema_decay=0.99)

    batch = {
        "images": np.random.default_rng(0).uniform(size=(16, 8, 8, 1)).astype(
            np.float32
        )
    }
    sharded = shard_batch(batch, mesh)
    # Batch is actually split over the data axis.
    assert (
        sharded["images"].sharding.spec[0] == "data"
        or sharded["images"].addressable_shards[0].data.shape[0] == 2
    )

    losses = []
    rng = jax.random.PRNGKey(1)
    for _ in range(5):
        state, metrics = step(state, sharded, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 5
    # EMA tracked and distinct from params after updates.
    diff = jax.tree_util.tree_reduce(
        lambda acc, t: acc + float(jnp.sum(jnp.abs(t[0] - t[1]))),
        jax.tree_util.tree_map(
            lambda a, b: (a, b), state.params, state.ema_params
        ),
        0.0,
    )
    assert diff > 0.0


def test_fsdp_sharding_rules_2x4_mesh():
    model = GaussianDiffusion_DDPM(tiny_config())
    mesh = make_mesh(shape=(2, 4))  # data=2, fsdp=4
    params = model.init_params(jax.random.PRNGKey(0))
    shardings = fsdp_param_shardings(params, mesh)
    placed = jax.device_put(params, shardings)
    # Sharded train step still runs with fsdp-placed params.
    tx = default_optimizer().build()
    state = create_train_state(placed, tx)
    step = make_train_step(model, tx, mesh)
    batch = shard_batch(
        {"images": np.ones((8, 8, 8, 1), dtype=np.float32) * 0.5}, mesh
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_sampling_under_mesh_sharding():
    # Sampling jit works with params placed on a mesh (replicated).
    model = GaussianDiffusion_DDPM(tiny_config(num_scales=8))
    mesh = make_mesh()
    params = model.init_params(jax.random.PRNGKey(0))
    from xdiffusion_tpu.parallel.mesh import replicated

    params = jax.device_put(params, replicated(mesh))
    samples = model.sample(params, jax.random.PRNGKey(1), num_samples=8)
    assert samples.shape == (8, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(samples)))


def test_tensor_parallel_dit_train_step():
    """3-axis (data, fsdp, tensor) mesh: DiT trains with Megatron-style
    column/row parameter shardings; GSPMD derives the block all-reduces."""
    import copy

    import optax
    import yaml

    from xdiffusion_tpu.config import DotConfig
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        tensor_param_shardings,
    )

    cfg = yaml.safe_load(open("configs/image/mnist/dit.yaml"))
    p = cfg["diffusion"]["score_network"]["params"]
    p.update({"hidden_size": 32, "depth": 2, "num_heads": 2, "patch_size": 8})
    p["conditioning"]["projections"]["timestep"]["params"]["hidden_size"] = 32
    p["conditioning"]["projections"]["classes"]["params"]["hidden_size"] = 32
    cfg["diffusion"]["noise_scheduler"]["params"]["num_scales"] = 8
    cfg["diffusion"]["noise_scheduler"]["params"]["schedule_type"] = "cosine"
    model = GaussianDiffusion_DDPM(DotConfig(cfg))

    mesh = make_mesh(shape=(2, 2, 2), axis_names=("data", "fsdp", "tensor"))
    params = model.init_params(jax.random.PRNGKey(0))
    rules = tensor_param_shardings(params, mesh)
    params = jax.device_put(params, rules)
    # qkv kernels actually shard over 'tensor'.
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params["params"], sep="/")
    qkv = [v for k, v in flat.items() if k.endswith("attn/qkv/kernel")]
    assert qkv and all(
        "tensor" in str(v.sharding.spec) for v in qkv
    ), [str(v.sharding.spec) for v in qkv]

    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    batch = shard_batch(
        {
            "images": np.random.default_rng(0).uniform(
                size=(8, 32, 32, 1)
            ).astype(np.float32),
            "classes": np.arange(8, dtype=np.int32) % 10,
        },
        mesh,
    )

    @jax.jit
    def step(p, opt, rng):
        def loss_fn(pp):
            loss, _ = model.loss_on_batch(
                pp, rng, batch["images"], {"classes": batch["classes"]}
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    new_params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # Updated params keep their tensor sharding.
    flat2 = flatten_dict(new_params["params"], sep="/")
    qkv2 = [v for k, v in flat2.items() if k.endswith("attn/qkv/kernel")]
    assert all("tensor" in str(v.sharding.spec) for v in qkv2)


def test_device_importance_sampling_in_train_step():
    """Loss-aware importance sampling runs entirely inside the jitted,
    DP-sharded train step: timesteps drawn from the device-resident
    loss-history distribution, history updated in the returned state —
    no (B,) host round-trip per step."""
    from xdiffusion_tpu.importance_sampling import ImportanceSampler

    model = GaussianDiffusion_DDPM(tiny_config())
    mesh = make_mesh()
    params = model.init_params(jax.random.PRNGKey(0))
    tx = default_optimizer().build()
    sampler = ImportanceSampler(num_timesteps=10, history_per_term=2)
    state = create_train_state(params, tx, importance_sampler=sampler)
    assert state.importance_state is not None
    step = make_train_step(model, tx, mesh, importance_sampler=sampler)

    batch = {
        "images": np.random.default_rng(0)
        .uniform(size=(16, 8, 8, 1))
        .astype(np.float32)
    }
    sharded = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, metrics = step(state, sharded, rng)
    counts = np.asarray(state.importance_state["loss_counts"])
    # 48 losses fed back across 3 steps: history is filling up.
    assert counts.sum() > 0
    assert np.all(np.isfinite(np.asarray(state.importance_state["loss_history"])))
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
