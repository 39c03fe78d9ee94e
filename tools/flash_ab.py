"""On-chip A/B of the blocked long-sequence flash kernel vs the XLA
einsum path at the repo's real video-transformer attention shapes.

The `_flash_eligible` gate (ops/attention.py) was calibrated against the
LTX/Hunyuan latent grids (16x32x32 -> 4k-16k tokens, head_dim 64/128);
this tool produces the measured evidence behind that gate: forward and
forward+backward wall time for `ops.flash_attention.flash_attention`
vs `_xla_attention` at each shape, printed as JSON rows (and appended to
tools/tpu_recovery_results.jsonl with stage=flash_ab when --record).

Usage:  python tools/flash_ab.py [--iters 20] [--record]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, batch, heads, seq, head_dim) — LTX-Video: dim 2048 = 32h x 64d;
# HunyuanVideo: dim 3072 = 24h x 128d. Token counts for a 16x32x32 latent
# grid are 16384 raw / 4096 after 1x2x2 patchify.
SHAPES = [
    ("ltx 4k tokens (patchified 16x32x32), d=64", 2, 32, 4096, 64),
    ("hunyuan 4k tokens, d=128", 2, 24, 4096, 128),
    ("ltx 16k tokens (raw 16x32x32), d=64", 1, 32, 16384, 64),
    ("hunyuan 8k tokens, d=128", 1, 24, 8192, 128),
]


def timed(fn, args, iters):
    import numpy as np

    out = fn(*args)
    # Force a real data fetch — block_until_ready under-syncs through the
    # axon tunnel (see .claude/skills/verify).
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., 0, 0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][..., 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--record", action="store_true")
    ap.add_argument(
        "--shapes",
        default=None,
        help="override: semicolon-separated b,h,s,d tuples, e.g. "
        "'1,32,8192,64;1,24,6144,128'",
    )
    args = ap.parse_args()
    if args.shapes:
        SHAPES = [
            (spec, *map(int, spec.split(",")))
            for spec in args.shapes.split(";")
        ]

    import jax
    import jax.numpy as jnp

    from xdiffusion_tpu.ops.attention import _xla_attention
    from xdiffusion_tpu.ops.flash_attention import flash_attention

    rows = []
    for label, b, h, s, d in SHAPES:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
        scale = d**-0.5

        flash_f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
        xla_f = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, scale).astype(jnp.float32))

        def loss_xla(q, k, v):
            return jnp.sum(_xla_attention(q, k, v, scale).astype(jnp.float32))

        flash_g = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
        xla_g = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

        row = {"stage": "flash_ab", "label": label, "shape": [b, h, s, d]}

        # Per-op attribution: at 8k+ tokens the XLA baseline's fp32
        # (S, S) logits are h*S^2*4 bytes (8.6 GB at 8k d=64 h=32, 34 GB
        # at 16k) — ITS failure must not read as a flash-kernel crash
        # (round 4 mis-attributed exactly this).
        def attempt(name, fn, fn_args, iters):
            try:
                return timed(fn, fn_args, iters)
            except Exception as e:  # OOM/compile failure must be visible
                row[name + "_error"] = repr(e)[:220]
                return None

        t_ff = attempt("flash_fwd", flash_f, (q, k, v), args.iters)
        t_xf = attempt("xla_fwd", xla_f, (q, k, v), args.iters)
        if t_ff and t_xf:
            row["fwd_ms"] = {"flash": round(t_ff * 1e3, 3),
                             "xla": round(t_xf * 1e3, 3),
                             "speedup": round(t_xf / t_ff, 3)}
        elif t_ff:
            row["fwd_ms"] = {"flash": round(t_ff * 1e3, 3)}
        t_fg = attempt(
            "flash_fwdbwd", flash_g, (q, k, v), max(2, args.iters // 2)
        )
        t_xg = attempt(
            "xla_fwdbwd", xla_g, (q, k, v), max(2, args.iters // 2)
        )
        if t_fg and t_xg:
            row["fwdbwd_ms"] = {"flash": round(t_fg * 1e3, 3),
                                "xla": round(t_xg * 1e3, 3),
                                "speedup": round(t_xg / t_fg, 3)}
        elif t_fg:
            row["fwdbwd_ms"] = {"flash": round(t_fg * 1e3, 3)}
        if t_ff and t_xf:
            # numerics sanity at this shape
            import numpy as np

            diff = np.asarray(
                jnp.abs(
                    flash_f(q, k, v).astype(jnp.float32)
                    - xla_f(q, k, v).astype(jnp.float32)
                ).max()
            )
            row["max_abs_diff"] = float(diff)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.record:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tpu_recovery_results.jsonl")
        with open(path, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
