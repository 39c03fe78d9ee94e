"""Large-batch TRAINING throughput sweep (VERDICT round-4 item 3).

Round 4 root-caused a batch-minor XLA layout flip that taxed batch>=256
SAMPLING and fixed it with in-jit chunking — but the chunked forward is
deliberately sampling-only (dropout rng semantics), so the flagship UNet
TRAIN step was never measured post-fix. This sweep times the full jitted
train step (loss+grad+clip+adam+EMA) for the flagship DDPM-MNIST UNet at
batch 64/128/256/512 and prints one JSON row per batch:

  {"batch": B, "steps_per_sec": ..., "samples_per_sec": ...,
   "per_sample_us": ...}

Flat per-sample cost 64->512 means the layout flip does not tax training
(the backward's conv layouts differ from the sampling scan's); a rising
per-sample cost localizes VERDICT weak #3.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPEATS = 8
BATCHES = (64, 128, 256, 512)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--batches",
        default=None,
        help="comma-separated batch sizes (default 64,128,256,512); "
        "split across invocations when compile budget is tight",
    )
    ap.add_argument(
        "--config_path",
        default=None,
        help="train-step config to sweep (default: flagship DDPM-MNIST); "
        "e.g. configs/image/mnist/dit_moe.yaml for the MoE row",
    )
    args = ap.parse_args()
    global BATCHES
    if args.batches:
        BATCHES = tuple(int(x) for x in args.batches.split(","))

    import jax
    import numpy as np

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step,
        shard_batch,
    )

    config_path = args.config_path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml",
    )
    config = load_yaml(config_path)
    config.diffusion.score_network.params.to_dict()["dtype"] = "bfloat16"
    model = GaussianDiffusion_DDPM(config)
    tx = default_optimizer().build()
    mesh = make_mesh()
    n_chips = len(jax.devices())
    rng = np.random.default_rng(0)

    rows = []
    for batch in BATCHES:
        params = model.init_params(jax.random.PRNGKey(0))
        state = create_train_state(params, tx, ema=True)
        step = make_train_step(model, tx, mesh, ema_decay=0.9999)
        host_batch = {
            "images": rng.uniform(size=(batch, 32, 32, 1)).astype(np.float32)
        }
        sn = config.diffusion.score_network.params
        if bool(sn.get("is_class_conditional", False)) or int(
            sn.get("label_dim", 0) or 0
        ) > 0:
            host_batch["classes"] = (
                np.arange(batch, dtype=np.int32) % 10
            )
        batch_np = shard_batch(host_batch, mesh)
        key = jax.random.PRNGKey(1)
        # Warm up (compile) + 2 steady-state steps.
        for _ in range(3):
            state, metrics = step(state, batch_np, key)
        np.asarray(metrics["loss"])  # force a real fetch through the tunnel

        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            state, metrics = step(state, batch_np, key)
            np.asarray(metrics["loss"])
            best = min(best, time.perf_counter() - t0)
        sps = batch / best / n_chips
        row = {
            "batch": batch,
            "step_ms": round(best * 1e3, 3),
            "samples_per_sec_per_chip": round(sps, 2),
            "per_sample_us": round(best / batch * 1e6, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        del state, step

    base = rows[0]["per_sample_us"]
    worst = max(r["per_sample_us"] for r in rows)
    print(
        json.dumps(
            {
                "summary": "train-batch-sweep",
                "flat_64_to_512": bool(worst <= base * 1.1),
                "worst_vs_base": round(worst / base, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
