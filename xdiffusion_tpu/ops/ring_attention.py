"""Ring attention: sequence-parallel attention over a mesh axis.

A beyond-reference TPU feature (the reference has no sequence/context
parallelism at all — SURVEY §5 "long-context": no ring attention, no
context-parallel axis). Long-token-count DiT-family score networks
(video transformers, high-resolution latents) shard the TOKEN axis over
a 'sequence' mesh axis; attention then runs as a ring:

  each device holds a q/k/v shard of S/n tokens. For n steps, every
  device computes blockwise attention of its q shard against the k/v
  shard currently resident, folds it into a running online-softmax
  state (m, l, acc), and passes its k/v shard to the next device with
  `jax.lax.ppermute` — a neighbor exchange that rides the ICI ring.
  After n steps every q shard has attended to every k/v shard; no
  device ever materializes the full sequence, and the (S_local, S)
  logits never exist anywhere.

Non-causal (diffusion transformers are bidirectional). Compute is the
same blocked online softmax as the Pallas flash kernel, expressed at the
XLA level so the per-step matmuls fuse and overlap with the ppermute.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    scale: Optional[float] = None,
) -> jax.Array:
    """Attention over sequence-sharded q/k/v INSIDE a shard_map.

    q: (B, H, S_local, D) local shard; k/v likewise. Returns the local
    (B, H, S_local, D) output shard. Must run under shard_map/pjit with
    `axis_name` bound to the sequence mesh axis."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    b, h, sq, d = q.shape
    m0 = jnp.full((b, h, sq), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((b, h, sq), dtype=jnp.float32)
    acc0 = jnp.zeros((b, h, sq, d), dtype=jnp.float32)

    def step(carry, _):
        k_cur, v_cur, m, l, acc = carry
        logits = (
            jnp.einsum(
                "bhqd,bhkd->bhqk", q, k_cur, preferred_element_type=jnp.float32
            )
            * scale
        )
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32,
        )
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_next, v_next, m_new, l_new, acc_new), None

    (k, v, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), None, length=n
    )
    return (acc / l[..., None]).astype(q.dtype)


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "sequence",
    scale: Optional[float] = None,
) -> jax.Array:
    """Convenience wrapper: shard (B, H, S, D) tensors over `axis_name`
    on their token axis and run the ring. The batch axis additionally
    respects an existing 'data' mesh axis if present."""
    from jax.experimental.shard_map import shard_map
    import functools

    batch_axis = "data" if "data" in mesh.axis_names else None
    spec = P(batch_axis, None, axis_name, None)

    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis_name, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)
