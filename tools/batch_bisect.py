"""Bisect the batch-scaling per-sample cost growth (BASELINE.md residual).

Times the flagship eps-forward at batch 64..512 in three variants:
  - full: the shipped network
  - no_attn: SpatialCrossAttention patched to identity (isolates whether
    the attention stack is the super-linear component)
  - attn_only: the attention op alone at the shapes the UNet uses
    (B, 256 tokens, 128 ch at the 16x16 resolution)

Prints one JSON line per batch with per-sample microseconds for each
variant, then a summary attributing the 64->512 growth.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

BATCHES = (64, 128, 256, 512)
REPEATS = 20


def timed(fn, *args):
    import numpy as np

    np.asarray(fn(*args))  # compile + forced fetch through the tunnel
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / REPEATS


def main():
    import jax
    import jax.numpy as jnp

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    import xdiffusion_tpu.layers.attention as attn_mod

    config_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml",
    )
    config = load_yaml(config_path)
    config.diffusion.score_network.params.to_dict()["dtype"] = "bfloat16"
    model = GaussianDiffusion_DDPM(config)
    params = model.init_params(jax.random.PRNGKey(0))

    def fwd(x, t):
        return model.predict_score(params, x, {"timestep": t})

    def attn_op(q, k, v):
        from xdiffusion_tpu.ops.attention import attention_qkv

        return attention_qkv(q, k, v, heads=2)

    jit_fwd = jax.jit(fwd)
    jit_attn = jax.jit(attn_op)

    orig_call = attn_mod.SpatialCrossAttention.__call__

    rows = []
    for batch in BATCHES:
        x = jnp.zeros((batch, 32, 32, 1), dtype=jnp.float32)
        t = jnp.zeros((batch,), dtype=jnp.int32)

        full = timed(jit_fwd, x, t)

        # attention -> identity (new jit avoids reusing the full trace)
        attn_mod.SpatialCrossAttention.__call__ = (
            lambda self, x, context=None, **kw: x
        )
        try:
            noattn = timed(jax.jit(fwd), x, t)
        finally:
            attn_mod.SpatialCrossAttention.__call__ = orig_call

        row = {
            "batch": batch,
            "full_us_per_sample": round(full / batch * 1e6, 2),
            "no_attn_us_per_sample": round(noattn / batch * 1e6, 2),
            "attn_block_us_per_sample": round((full - noattn) / batch * 1e6, 2),
        }
        print(json.dumps(row), flush=True)

        # the attention op alone at the UNet's 16x16 shapes
        # (attention_channels 64, 2 heads -> (B, 256, 128) projections)
        q = jnp.zeros((batch, 256, 128), dtype=jnp.bfloat16)
        attn = timed(jit_attn, q, q, q)
        row["attn_op_us_per_sample"] = round(attn / batch * 1e6, 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    g_full = rows[-1]["full_us_per_sample"] / rows[0]["full_us_per_sample"]
    g_noattn = (
        rows[-1]["no_attn_us_per_sample"] / rows[0]["no_attn_us_per_sample"]
    )
    print(json.dumps({
        "growth_64_to_512_full": round(g_full, 3),
        "growth_64_to_512_no_attn": round(g_noattn, 3),
        "growth_64_to_512_attn_block": round(
            rows[-1]["attn_block_us_per_sample"]
            / max(rows[0]["attn_block_us_per_sample"], 1e-9), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
