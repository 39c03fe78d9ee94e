"""Compile-only HLO comparison of the flagship eps-forward across batch
sizes (batch-scaling root-cause instrument, BASELINE.md residual).

For each batch, compiles the forward (no device run) and reports, per
sample: total copy bytes (explicit `copy`/`copy-start` instructions,
i.e. relayouts + HBM<->VMEM staging that XLA materialized), convert
bytes, transpose bytes, and the layouts chosen for the large activation
tensors. Prints one JSON line per batch.

Bytes are computed from the HLO shape strings (elements x itemsize of
the copy's output), so growth that XLA's cost analysis hides (layout
churn) becomes visible.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

BATCHES = (64, 512)

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
                "s8": 1, "u8": 1}

_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    """Bytes of the FIRST shape in an HLO instruction's result type."""
    m = _SHAPE_RE.search(text)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def analyze(txt: str, batch: int) -> dict:
    stats = {
        "copy_bytes": 0, "copy_n": 0,
        "convert_bytes": 0, "convert_n": 0,
        "transpose_bytes": 0, "transpose_n": 0,
        "bitcast_convert_n": 0,
        "fusion_n": 0,
    }
    act_layouts = {}
    for line in txt.splitlines():
        line = line.strip()
        if not line.startswith("%") and " = " not in line:
            continue
        rhs = line.split(" = ", 1)[-1]
        if " copy(" in rhs or rhs.startswith("copy("):
            stats["copy_n"] += 1
            stats["copy_bytes"] += shape_bytes(rhs)
        elif "copy-start(" in rhs:
            stats["copy_n"] += 1
            stats["copy_bytes"] += shape_bytes(rhs)
        elif rhs.startswith("convert(") or " convert(" in rhs:
            stats["convert_n"] += 1
            stats["convert_bytes"] += shape_bytes(rhs)
        elif rhs.startswith("transpose(") or " transpose(" in rhs:
            stats["transpose_n"] += 1
            stats["transpose_bytes"] += shape_bytes(rhs)
        elif "bitcast-convert(" in rhs:
            stats["bitcast_convert_n"] += 1
        elif rhs.startswith("fusion(") or " fusion(" in rhs:
            stats["fusion_n"] += 1
        # big activation layout census: batch x 32 x 32 x C tensors
        for m in re.finditer(
            rf"(bf16|f32)\[{batch},(32|16|8),\2,(\d+)\]\{{([0-9,]+)", line
        ):
            key = f"{m.group(1)}[{batch},{m.group(2)},{m.group(2)},{m.group(3)}]{{{m.group(4)}}}"
            act_layouts[key] = act_layouts.get(key, 0) + 1
    stats = {k: (round(v / batch, 1) if k.endswith("bytes") else v)
             for k, v in stats.items()}
    stats["per_sample_unit"] = "bytes/sample"
    # top-5 layout patterns by count
    stats["activation_layouts"] = dict(
        sorted(act_layouts.items(), key=lambda kv: -kv[1])[:8]
    )
    return stats


def main():
    import jax
    import jax.numpy as jnp

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM

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

    for batch in BATCHES:
        x = jnp.zeros((batch, 32, 32, 1), dtype=jnp.float32)
        t = jnp.zeros((batch,), dtype=jnp.int32)
        compiled = jax.jit(fwd).lower(x, t).compile()
        txt = compiled.as_text()
        ca = compiled.cost_analysis()
        row = {"batch": batch}
        row.update(analyze(txt, batch))
        if ca:
            row["cost_bytes_per_sample"] = round(
                float(ca.get("bytes accessed", 0.0)) / batch, 1
            )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
