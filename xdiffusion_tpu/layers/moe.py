"""Mixture-of-Experts MLP with expert parallelism (GShard/Switch style).

Beyond-reference capability: the reference framework has no MoE layers and
no expert parallelism (its only distribution mode is Accelerate DDP,
reference training/image/train.py:108-226, SURVEY §2.14). This module adds
the TPU-native formulation:

- **Dense dispatch, static shapes.** Token->expert routing is expressed as
  two einsums against a (tokens, experts, capacity) dispatch/combine tensor
  (the Mesh-TensorFlow / GShard recipe, arXiv:2006.16668) instead of
  gather/scatter — every shape is static, so the whole layer jits into one
  XLA program and the expert FFNs run as large batched MXU matmuls
  ("ecd,edh->ech" over stacked expert kernels).
- **Expert parallelism by annotation.** Expert kernels are stacked along a
  leading expert axis; `parallel.mesh.expert_param_shardings` shards that
  axis over an 'expert' mesh axis and GSPMD derives the all-to-all that
  moves capacity slots to their expert's device — no hand-written
  collectives (same philosophy as the rest of `parallel/`).
- **Capacity-bounded routing.** Each expert processes at most
  `ceil(T * top_k * capacity_factor / E)` tokens; overflowed tokens
  contribute zero from the MLP branch (their residual path is untouched).
- **Load-balance auxiliary loss** (Switch Transformer, arXiv:2101.03961):
  `E * sum_e f_e * p_e` over the top-1 dispatch fractions f and mean router
  probabilities p, sown as an `intermediates` collection entry
  ('moe_aux_loss') that `GaussianDiffusion_DDPM.loss_on_batch` folds into
  the training objective when the score network enables MoE.

The router runs in float32 regardless of the compute dtype (softmax over
expert logits is precision-sensitive); expert matmuls follow the module
dtype (bf16 on TPU) with the combine in float32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def compute_capacity(
    num_tokens: int, num_experts: int, top_k: int, capacity_factor: float
) -> int:
    """Per-expert token capacity (static, derived from static shapes)."""
    cap = int(math.ceil(num_tokens * top_k * capacity_factor / num_experts))
    return max(1, min(num_tokens, cap))


def top_k_routing(
    gates: jax.Array,
    capacity: int,
    top_k: int,
    normalize_gates: bool = True,
):
    """Build dense dispatch/combine tensors from router probabilities.

    gates: (T, E) float32 router probabilities (rows sum to 1).
    Returns (dispatch (T,E,C) 0/1 float32, combine (T,E,C) float32,
    aux_loss scalar). Sequential top-k assignment: round k+1 positions are
    offset by the tokens round k assigned to each expert, matching the
    GShard formulation; tokens whose position exceeds `capacity` are
    dropped (zero combine weight).
    """
    tokens, num_experts = gates.shape
    dispatch = jnp.zeros((tokens, num_experts, capacity), dtype=jnp.float32)
    combine = jnp.zeros_like(dispatch)
    gate_sum = jnp.zeros((tokens,), dtype=jnp.float32)
    counts = jnp.zeros((num_experts,), dtype=jnp.int32)
    remaining = gates
    first_choice = None
    for _ in range(top_k):
        idx = jnp.argmax(remaining, axis=-1)  # (T,)
        onehot = jax.nn.one_hot(idx, num_experts, dtype=jnp.int32)
        if first_choice is None:
            first_choice = onehot
        pos = jnp.cumsum(onehot, axis=0) - 1 + counts[None, :]
        pos_tok = jnp.sum(pos * onehot, axis=-1)  # (T,)
        keep = (pos_tok < capacity).astype(jnp.float32)
        gate_val = jnp.take_along_axis(
            remaining, idx[:, None], axis=-1
        )[:, 0] * keep
        slot = jax.nn.one_hot(
            jnp.clip(pos_tok, 0, capacity - 1), capacity, dtype=jnp.float32
        )
        assignment = (
            onehot.astype(jnp.float32)[:, :, None]
            * slot[:, None, :]
            * keep[:, None, None]
        )
        dispatch = dispatch + assignment
        combine = combine + gate_val[:, None, None] * assignment
        gate_sum = gate_sum + gate_val
        counts = counts + jnp.sum(onehot, axis=0)
        remaining = remaining * (1.0 - onehot.astype(remaining.dtype))
    if normalize_gates and top_k > 1:
        combine = combine / (gate_sum[:, None, None] + 1e-9)
    # Switch-style load-balance loss over the FIRST choice: fraction of
    # tokens whose argmax is expert e times mean router probability of e,
    # scaled by E so a perfectly uniform router scores 1.0.
    f = jnp.mean(first_choice.astype(jnp.float32), axis=0)
    p = jnp.mean(gates, axis=0)
    aux_loss = num_experts * jnp.sum(f * p)
    return dispatch, combine, aux_loss


class MoEMlp(nn.Module):
    """Drop-in MoE replacement for a transformer MLP branch.

    (B, S, D) -> (B, S, D); dropped (over-capacity) tokens return zeros so
    the caller's residual connection leaves them unchanged.
    """

    hidden_size: int
    mlp_dim: int
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    capacity: Optional[int] = None  # explicit override (tests)
    dropout: float = 0.0  # hidden-activation dropout, matching the dense MLP
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        batch, seq, dim = x.shape
        num_tokens = batch * seq
        num_experts = self.num_experts
        tokens = x.reshape(num_tokens, dim)

        logits = nn.Dense(
            num_experts, dtype=jnp.float32, name="router"
        )(tokens.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)
        capacity = (
            int(self.capacity)
            if self.capacity is not None
            else compute_capacity(
                num_tokens, num_experts, self.top_k, self.capacity_factor
            )
        )
        dispatch, combine, aux_loss = top_k_routing(
            gates, capacity, self.top_k
        )
        self.sow("intermediates", "moe_aux_loss", aux_loss)

        # Stacked expert FFN kernels, leading axis = expert (sharded over
        # the 'expert' mesh axis by expert_param_shardings).
        init = nn.initializers.lecun_normal()
        k1 = self.param(
            "experts_fc1", init, (num_experts, dim, self.mlp_dim)
        )
        b1 = self.param(
            "experts_fc1_bias", nn.initializers.zeros,
            (num_experts, self.mlp_dim),
        )
        k2 = self.param(
            "experts_fc2", init, (num_experts, self.mlp_dim, dim)
        )
        b2 = self.param(
            "experts_fc2_bias", nn.initializers.zeros, (num_experts, dim)
        )

        dt = self.dtype
        # Dispatch: (T,D) x (T,E,C) -> (E,C,D). The dispatch tensor is 0/1
        # so bf16 is exact.
        expert_in = jnp.einsum(
            "td,tec->ecd", tokens.astype(dt), dispatch.astype(dt)
        )
        h = jnp.einsum("ecd,edh->ech", expert_in, k1.astype(dt))
        h = h + b1.astype(dt)[:, None, :]
        h = nn.gelu(h, approximate=True)
        if self.dropout > 0.0:
            # Same placement as the dense MLP branch (DiTBlock: dropout on
            # the post-GELU hidden), so a dropout: config knob behaves
            # identically whether the MLP is dense or expert-routed.
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = jnp.einsum("ech,ehd->ecd", h, k2.astype(dt))
        out = out + b2.astype(dt)[:, None, :]
        # Combine in float32: gate weights are probabilities.
        y = jnp.einsum(
            "ecd,tec->td", out.astype(jnp.float32), combine
        )
        return y.reshape(batch, seq, dim).astype(x.dtype)
