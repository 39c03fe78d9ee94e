"""Sequence parallelism as a CONSUMER feature (not just the ring op):
with a ('data', 'sequence') mesh registered, token self-attention in
DiT-family score networks routes through the ring-attention shard_map,
and both a forward pass and a full training step match the unsharded
run. Beyond-reference capability (the reference has no context
parallelism; SURVEY §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.ops.attention import (
    sequence_parallel,
    set_sequence_parallel_mesh,
)
from xdiffusion_tpu.parallel import make_mesh


@pytest.fixture(autouse=True)
def _clear_ctx():
    yield
    set_sequence_parallel_mesh(None)


def _sora_cfg():
    return DotConfig(
        {
            "input_spatial_size": 8,
            "input_channels": 1,
            "input_number_of_frames": 4,
            "is_learned_sigma": False,
            "is_class_conditional": False,
            "input_size": [4, 8, 8],
            "input_sq_size": 8,
            "patch_size": [1, 4, 4],
            "hidden_size": 32,
            "depth": 2,
            "num_heads": 2,
            "mlp_ratio": 2.0,
            "class_dropout_prob": 0.0,
            "pred_sigma": False,
            "drop_path": 0.0,
            "caption_channels": 48,
            "model_max_length": 8,
            "qk_norm": True,
        }
    )


def test_sora_forward_matches_under_sequence_parallel():
    """The Sora video transformer's spatial AND temporal attentions ring
    over the 'sequence' axis (4 shards) without changing the output."""
    from xdiffusion_tpu.score_networks.sora import Sora

    net = Sora(config=_sora_cfg())
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 1))
    ctx = {
        "timestep": jnp.array([0.3, 0.7]),
        "text_embeddings": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 48)),
    }
    params = jax.jit(net.init)(jax.random.PRNGKey(2), x, ctx)
    # Perturb the zero-init heads so deeper layers contribute.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [
        l + 0.05 * jax.random.normal(jax.random.PRNGKey(100 + i), l.shape)
        for i, l in enumerate(leaves)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    out_plain = np.asarray(net.apply(params, x, ctx))

    mesh = make_mesh(shape=(2, 4), axis_names=("data", "sequence"))
    with sequence_parallel(mesh):
        out_sp = np.asarray(jax.jit(net.apply)(params, x, ctx))
    np.testing.assert_allclose(out_sp, out_plain, atol=2e-5)
    assert not np.allclose(out_plain, 0.0)


def test_training_step_loss_matches_under_sequence_parallel():
    """Full jitted train step over mesh {'data': 2, 'sequence': 4} —
    the same check the driver's dryrun_multichip phase 3 runs."""
    import __graft_entry__ as g

    g._dryrun_sequence_parallel(jax.devices("cpu"), 8)
