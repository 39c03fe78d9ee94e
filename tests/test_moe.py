"""Mixture-of-Experts MLP + expert parallelism (layers/moe.py,
parallel.mesh.expert_param_shardings).

Beyond-reference capability (the reference has no MoE and no expert
parallelism — SURVEY §2.14: DDP only), so there is no golden-parity
target; correctness is established against a naive per-token routing
oracle, and the EP sharding against the unsharded computation on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from xdiffusion_tpu.layers.moe import (
    MoEMlp,
    compute_capacity,
    top_k_routing,
)
from xdiffusion_tpu.parallel import expert_param_shardings, make_mesh


def _naive_moe(params, x, top_k, capacity):
    """Per-token oracle: route each token to its top-k experts (respecting
    sequential capacity assignment), apply the chosen expert FFNs, combine
    with (normalized for k>1) gate weights."""
    p = params["params"]
    b, s, d = x.shape
    tok = np.asarray(x, np.float64).reshape(b * s, d)
    logits = tok @ np.asarray(p["router"]["kernel"], np.float64) + np.asarray(
        p["router"]["bias"], np.float64
    )
    gates = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1), np.float64)
    n_exp = gates.shape[-1]
    counts = np.zeros(n_exp, np.int64)
    out = np.zeros_like(tok)
    remaining = gates.copy()
    contrib = [[] for _ in range(tok.shape[0])]
    for _ in range(top_k):
        idx = remaining.argmax(axis=-1)
        round_counts = np.zeros(n_exp, np.int64)
        for t in range(tok.shape[0]):
            e = idx[t]
            pos = counts[e] + round_counts[e]
            round_counts[e] += 1
            if pos < capacity:
                contrib[t].append((e, remaining[t, e]))
            remaining[t, e] = 0.0
        counts += round_counts
    for t in range(tok.shape[0]):
        denom = sum(g for _, g in contrib[t]) if top_k > 1 else 1.0
        for e, g in contrib[t]:
            h = tok[t] @ np.asarray(p["experts_fc1"][e], np.float64)
            h = h + np.asarray(p["experts_fc1_bias"][e], np.float64)
            h = np.asarray(
                jax.nn.gelu(jnp.asarray(h, jnp.float64), approximate=True)
            )
            o = h @ np.asarray(p["experts_fc2"][e], np.float64)
            o = o + np.asarray(p["experts_fc2_bias"][e], np.float64)
            out[t] += (g / (denom + (1e-9 if top_k > 1 else 0.0))) * o
    return out.reshape(b, s, d)


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_matches_naive_routing(top_k):
    # Capacity = all tokens: nothing dropped, so the dense-dispatch einsum
    # formulation must match per-token routing exactly.
    b, s, d, e = 2, 8, 16, 4
    m = MoEMlp(
        hidden_size=d, mlp_dim=32, num_experts=e, top_k=top_k, capacity=b * s
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d))
    params = m.init(jax.random.PRNGKey(1), x)
    got = np.asarray(m.apply(params, x))
    want = _naive_moe(params, x, top_k=top_k, capacity=b * s)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_moe_capacity_drops_to_zero():
    # Capacity 1: at most one token per expert passes; every dropped token
    # must contribute exactly zero (residual-transparent).
    b, s, d, e = 1, 8, 8, 2
    m = MoEMlp(hidden_size=d, mlp_dim=16, num_experts=e, capacity=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d))
    params = m.init(jax.random.PRNGKey(1), x)
    got = np.asarray(m.apply(params, x))
    nonzero_tokens = (np.abs(got.reshape(s, d)).max(axis=-1) > 0).sum()
    assert nonzero_tokens <= e
    want = _naive_moe(params, x, top_k=1, capacity=1)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_capacity_formula():
    assert compute_capacity(64, 8, 1, 1.0) == 8
    assert compute_capacity(64, 8, 2, 1.25) == 20
    assert compute_capacity(4, 8, 1, 1.0) == 1  # floor at 1
    assert compute_capacity(8, 2, 1, 100.0) == 8  # ceiling at T


def test_aux_loss_prefers_balance():
    # Genuinely balanced dispatch (argmax cycles over all experts, mean
    # router probability uniform) -> aux == 1.0; fully collapsed routing
    # -> aux == E. Note exactly-uniform gate rows would pass trivially
    # (argmax ties always pick expert 0 but f·p still sums to 1/E), so
    # use a permuted near-one-hot pattern that exercises a real uniform
    # first-choice fraction f.
    t, e = 16, 4
    eps = 0.01
    balanced = jnp.full((t, e), eps / (e - 1))
    rows = jnp.arange(t) % e
    balanced = balanced.at[jnp.arange(t), rows].set(1.0 - eps)
    _, _, aux_u = top_k_routing(balanced, capacity=t, top_k=1)
    # f is exactly uniform (each expert argmax-wins t/e tokens) and p is
    # uniform by symmetry, so aux = E * sum_e (1/E * 1/E) = 1.
    assert np.isclose(float(aux_u), 1.0, atol=1e-6)
    collapsed = jax.nn.softmax(
        jnp.tile(jnp.array([[100.0, 0.0, 0.0, 0.0]]), (t, 1)), axis=-1
    )
    _, _, aux_c = top_k_routing(collapsed, capacity=t, top_k=1)
    assert float(aux_c) > 3.5


def test_moe_gradients_flow_to_all_touched_params():
    b, s, d, e = 2, 8, 16, 4
    m = MoEMlp(hidden_size=d, mlp_dim=32, num_experts=e, capacity=b * s)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d))
    params = m.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return (m.apply(p, x) ** 2).mean()

    g = jax.grad(loss)(params)["params"]
    assert float(jnp.abs(g["router"]["kernel"]).sum()) > 0.0
    assert float(jnp.abs(g["experts_fc1"]).sum()) > 0.0
    assert float(jnp.abs(g["experts_fc2"]).sum()) > 0.0


def test_expert_parallel_matches_unsharded():
    # Mesh {'data': 2, 'expert': 4}: expert kernels sharded over 'expert',
    # batch over 'data'; GSPMD's all-to-all dispatch must be numerically
    # identical to the single-device computation.
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "expert"))
    b, s, d, e = 8, 4, 16, 4
    m = MoEMlp(hidden_size=d, mlp_dim=32, num_experts=e, capacity=b * s)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d))
    params = m.init(jax.random.PRNGKey(1), x)

    want = np.asarray(m.apply(params, x))

    rules = expert_param_shardings(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(rules)
    # the stacked expert kernels actually got the 'expert' axis
    expert_rules = [
        r for path, r in flat if any("experts_" in str(k) for k in path)
    ]
    assert expert_rules and all(
        r.spec[0] == "expert" for r in expert_rules
    )

    p_sh = jax.device_put(params, rules)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = np.asarray(jax.jit(m.apply)(p_sh, x_sh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_moe_dit_trains_and_aux_loss_reported():
    # End to end: the dit_moe config builds, loss_on_batch folds the
    # load-balance aux term into the objective, gradients are finite.
    import os

    from xdiffusion_tpu.config import DotConfig, load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs/image/mnist/dit_moe.yaml"
    )
    raw = load_yaml(cfg_path).to_dict()
    # shrink for test speed
    sn = raw["diffusion"]["score_network"]["params"]
    sn["depth"] = 2
    sn["hidden_size"] = 64
    sn["num_heads"] = 2
    sn["num_experts"] = 4
    for proj in sn["conditioning"]["projections"].values():
        proj["params"]["hidden_size"] = 64
    model = GaussianDiffusion_DDPM(DotConfig(raw))
    params = model.init_params(jax.random.PRNGKey(0))

    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 1))
    ctx = {"classes": jnp.zeros((4,), jnp.int32)}

    def loss_fn(p):
        total, metrics = model.loss_on_batch(
            p, jax.random.PRNGKey(2), x, ctx
        )
        return total, metrics

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )
    assert np.isfinite(float(total))
    assert "moe_aux_loss" in metrics
    aux = float(metrics["moe_aux_loss"])
    assert np.isfinite(aux) and aux > 0.0
    # the aux term is part of the objective
    assert float(total) >= float(metrics["mse_loss"])
    gn = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        grads,
        0.0,
    )
    assert np.isfinite(gn) and gn > 0.0
