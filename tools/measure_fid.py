"""CLI: FID of a trained checkpoint against the training distribution.

The reference repo ships no metric code (SURVEY §5); this tool drives the
repo's FID harness (xdiffusion_tpu/eval/fid.py — LeNet-feature Frechet
distance, features standardized by the real-set statistics) end-to-end:
load checkpoint -> sample N images with the configured sampler -> FID
vs N held-out real images. Prints one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description="Measure FID for a checkpoint.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--dataset_name", type=str, default="image/mnist")
    p.add_argument("--num_samples", type=int, default=2048)
    p.add_argument("--sampling_steps", type=int, default=50)
    p.add_argument("--sample_batch", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument(
        "--allow-synthetic",
        action="store_true",
        help="permit FID against the synthetic stand-in dataset (the "
        "number is then NOT comparable to real-data FID; it is tagged "
        "synthetic_data=true in the output)",
    )
    args = p.parse_args()

    import jax
    import numpy as np

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.datasets.utils import load_dataset
    from xdiffusion_tpu.eval.fid import compute_fid
    from xdiffusion_tpu.samplers.ddim import DDIMSampler
    from xdiffusion_tpu.training.image.train import build_model

    config = load_yaml(args.config_path)
    model = build_model(config)
    params = model.init_params(jax.random.PRNGKey(0))

    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import create_train_state

    tx = default_optimizer().build()
    try:
        state = create_train_state(params, tx, ema=True)
        state, step = checkpoints.restore_checkpoint(args.checkpoint, state)
    except Exception:
        # Checkpoint was saved without EMA tracking.
        state = create_train_state(params, tx, ema=False)
        state, step = checkpoints.restore_checkpoint(args.checkpoint, state)
    sample_params = state.ema_params if args.use_ema and state.ema_params else (
        state.params
    )
    print(f"restored step {step}", flush=True)

    samples = []
    sampler = DDIMSampler()
    n_done = 0
    i = 0
    while n_done < args.num_samples:
        b = min(args.sample_batch, args.num_samples - n_done)
        out = model.sample(
            sample_params,
            jax.random.PRNGKey(args.seed + i),
            num_samples=b,
            num_sampling_steps=args.sampling_steps,
            sampler=sampler,
        )
        samples.append(np.asarray(out))
        n_done += b
        i += 1
        print(f"sampled {n_done}/{args.num_samples}", flush=True)
    generated = np.concatenate(samples, axis=0)

    dataset, _ = load_dataset(args.dataset_name, config=config, split="train")
    synthetic = bool(getattr(dataset, "synthetic", False))
    if synthetic and not args.allow_synthetic:
        print(
            json.dumps(
                {
                    "error": "refusing to report FID against the SYNTHETIC "
                    "stand-in dataset. Fetch real archives (python "
                    "tools/fetch_datasets.py) or pass --allow-synthetic "
                    "to get a clearly-tagged synthetic-data number.",
                }
            )
        )
        sys.exit(2)
    rng = np.random.default_rng(args.seed)
    idx = rng.permutation(len(dataset))[: 2 * args.num_samples]
    real = np.stack([np.asarray(dataset[int(j)][0]) for j in idx])
    if real.ndim == 3:
        real = real[..., None]
    labels = np.asarray([dataset[int(j)][1] for j in idx])
    real_fid, real_holdout = (
        real[: args.num_samples],
        real[args.num_samples :],
    )
    lab_fid = labels[: args.num_samples]

    fid = compute_fid(real_fid, generated, labels=lab_fid)
    from xdiffusion_tpu.eval.fid import train_feature_extractor

    m, pa, _ = train_feature_extractor(real_fid, lab_fid, steps=500)
    floor = compute_fid(real_fid, real_holdout, extractor=(m, pa))
    print(
        json.dumps(
            {
                "fid": round(fid, 3),
                "fid_floor_real_vs_real": round(floor, 3),
                "num_samples": args.num_samples,
                "sampling_steps": args.sampling_steps,
                "checkpoint_step": int(step),
                "synthetic_data": synthetic,
            }
        )
    )


if __name__ == "__main__":
    main()
