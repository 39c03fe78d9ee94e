"""Op-level TPU profile of the flagship paths (sample scan / eps-forward /
train step).

Captures a jax.profiler trace of the jitted program, parses the xplane
with jax.profiler.ProfileData, and prints the device-time breakdown by
fused-op name plus a category rollup (conv / matmul+attention / norm-stats
/ elementwise / copy-convert / other). This is the instrument behind the
round-2 batch-scaling root cause (BASELINE.md) — now a checked-in tool.

Usage:
    python tools/profile_ops.py --mode sample --batch 64 [--top 30]
    python tools/profile_ops.py --mode forward --batch 512
    python tools/profile_ops.py --mode train --batch 128

The reference has no profiling tooling at all (SURVEY §5); this is the
TPU-native observability equivalent.
"""

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_runner(mode: str, batch: int):
    import jax
    import jax.numpy as jnp

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.samplers.ddim import DDIMSampler

    config_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml",
    )
    config = load_yaml(config_path)
    config.diffusion.score_network.params.to_dict()["dtype"] = "bfloat16"
    model = GaussianDiffusion_DDPM(config)
    params = model.init_params(jax.random.PRNGKey(0))

    if mode == "sample":
        sampler = DDIMSampler()

        def run(i):
            out = model.sample(
                params,
                jax.random.PRNGKey(i),
                num_samples=batch,
                num_sampling_steps=50,
                sampler=sampler,
            )
            jax.block_until_ready(out)
            return out

        run(0)  # compile
        return run

    if mode == "forward":
        x = jnp.zeros((batch, 32, 32, 1), jnp.float32)
        t = jnp.zeros((batch,), jnp.int32)
        fwd = jax.jit(
            lambda p, x, t: model.predict_score(p, x, {"timestep": t})
        )

        def run(i):
            out = fwd(params, x, t)
            jax.block_until_ready(out)
            return out

        run(0)
        return run

    if mode == "train":
        from xdiffusion_tpu.training.image.train import (  # noqa: F401
            train as _train,
        )

        raise SystemExit(
            "train mode: use training/image/train.py with StepProfiler "
            "(--profile_step); this tool profiles inference paths."
        )

    raise SystemExit(f"unknown mode {mode}")


CATEGORIES = (
    ("convolution", ("convolution", "conv")),
    ("matmul/attention", ("dot", "einsum", "attention")),
    ("norm-stats", ("reduce", "variance", "norm")),
    ("copy/convert", ("copy", "convert", "transpose", "bitcast", "reshape")),
    ("fusion/elementwise", ("fusion", "add", "multiply", "select")),
)


def categorize(name: str) -> str:
    lname = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in lname for k in keys):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="sample", choices=["sample", "forward"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    run = build_runner(args.mode, args.batch)

    tmpdir = tempfile.mkdtemp(prefix="xdiff_prof_")
    jax.profiler.start_trace(tmpdir)
    for i in range(1, args.repeats + 1):
        run(i)
    jax.profiler.stop_trace()

    xplanes = glob.glob(
        os.path.join(tmpdir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        raise SystemExit(f"no xplane written under {tmpdir}")

    from jax.profiler import ProfileData

    pd = ProfileData.from_file(xplanes[0])
    op_time = {}
    total_ns = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/module rollup lines.
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for event in line.events:
                dur = event.duration_ns
                op_time[event.name] = op_time.get(event.name, 0.0) + dur
                total_ns += dur

    if not op_time:
        raise SystemExit(
            "no device op events found — available planes/lines: "
            + json.dumps(
                {
                    p.name: [ln.name for ln in p.lines]
                    for p in pd.planes
                }
            )[:2000]
        )

    rows = sorted(op_time.items(), key=lambda kv: -kv[1])
    cats = {}
    for name, ns in rows:
        cats[categorize(name)] = cats.get(categorize(name), 0.0) + ns

    print(
        f"\n== {args.mode} @ batch {args.batch} — device total "
        f"{total_ns / 1e6 / args.repeats:.3f} ms/run over {args.repeats} runs =="
    )
    print("\n-- category rollup --")
    for cat, ns in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{ns / total_ns * 100:6.2f}%  {ns / 1e6 / args.repeats:9.3f} ms  {cat}")
    print(f"\n-- top {args.top} ops --")
    for name, ns in rows[: args.top]:
        print(
            f"{ns / total_ns * 100:6.2f}%  {ns / 1e6 / args.repeats:9.3f} ms  "
            f"{name[:110]}"
        )


if __name__ == "__main__":
    main()
