"""CLI: per-frame FID + sampling throughput for a video checkpoint.

The video quality anchor (VERDICT round-4 item 4): loads a trained video
diffusion checkpoint, samples N videos with the configured sampler
(optionally a long-video sampling scheme), and scores PER-FRAME FID of
the generated frames against real dataset frames using the repo's
LeNet-feature Frechet harness (eval/fid.py). Prints one JSON line:

  {"frame_fid": ..., "fid_floor_real_vs_real": ..., "vids_per_sec": ...,
   "num_videos": N, "synthetic_data": bool}

Refuses a headline number on the synthetic stand-in dataset without
--allow-synthetic (same contract as tools/measure_fid.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description="Per-frame video FID.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--dataset_name", type=str, default="video/moving_mnist")
    p.add_argument("--num_videos", type=int, default=64)
    p.add_argument("--sample_batch", type=int, default=16)
    p.add_argument("--sampling_steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--allow-synthetic", action="store_true")
    args = p.parse_args()

    import jax
    import numpy as np

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.datasets.utils import load_dataset
    from xdiffusion_tpu.eval.fid import (
        compute_fid,
        train_feature_extractor,
    )
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import create_train_state
    from xdiffusion_tpu.training.image.train import build_model

    config = load_yaml(args.config_path)
    model = build_model(config)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = default_optimizer().build()
    try:
        state = create_train_state(params, tx, ema=True)
        state, step = checkpoints.restore_checkpoint(args.checkpoint, state)
    except Exception:
        state = create_train_state(params, tx, ema=False)
        state, step = checkpoints.restore_checkpoint(args.checkpoint, state)
    sample_params = (
        state.ema_params if state.ema_params is not None else state.params
    )
    print(f"restored step {step}", flush=True)

    dataset, _ = load_dataset(args.dataset_name, config=config, split="train")
    synthetic = bool(getattr(dataset, "synthetic", False))
    if synthetic and not args.allow_synthetic:
        print(
            json.dumps(
                {
                    "error": "refusing to report video FID against the "
                    "SYNTHETIC stand-in dataset. Fetch real archives "
                    "(python tools/fetch_datasets.py) or pass "
                    "--allow-synthetic for a tagged number.",
                }
            )
        )
        sys.exit(2)

    kwargs = {}
    if args.sampling_steps:
        kwargs["num_sampling_steps"] = args.sampling_steps
    vids = []
    t_total = 0.0
    n_done = 0
    i = 0
    while n_done < args.num_videos:
        b = min(args.sample_batch, args.num_videos - n_done)
        t0 = time.perf_counter()
        out = model.sample(
            sample_params,
            jax.random.PRNGKey(args.seed + i),
            num_samples=b,
            **kwargs,
        )
        out = np.asarray(out)  # force fetch before reading the timer
        t_total += time.perf_counter() - t0
        vids.append(out)
        n_done += b
        i += 1
        print(f"sampled {n_done}/{args.num_videos} videos", flush=True)
    generated = np.concatenate(vids)  # (N, F, S, S, C)
    gen_frames = generated.reshape((-1,) + generated.shape[2:])

    # Real frames + labels for the feature extractor.
    rng = np.random.default_rng(args.seed)
    idx = rng.permutation(len(dataset))[: 2 * args.num_videos]
    real_vids = dataset.videos[idx].astype(np.float32) / 255.0
    real_labels = np.asarray(dataset.labels[idx])
    if real_labels.ndim > 1:
        real_labels = real_labels[:, 0]
    f = min(real_vids.shape[1], generated.shape[1])
    frame_labels = np.repeat(real_labels, f)
    real_frames = real_vids[:, :f].reshape((-1,) + real_vids.shape[2:])

    half = len(real_frames) // 2
    m, pa, _ = train_feature_extractor(
        real_frames[:half], frame_labels[:half], steps=500
    )
    n_eval = min(len(gen_frames), half)
    fid = compute_fid(
        real_frames[:n_eval], gen_frames[:n_eval], extractor=(m, pa)
    )
    floor = compute_fid(
        real_frames[:n_eval],
        real_frames[half : half + n_eval],
        extractor=(m, pa),
    )
    print(
        json.dumps(
            {
                "frame_fid": round(fid, 3),
                "fid_floor_real_vs_real": round(floor, 3),
                "vids_per_sec": round(args.num_videos / t_total, 3),
                "num_videos": args.num_videos,
                "frames_per_video": int(f),
                "checkpoint_step": int(step),
                "synthetic_data": synthetic,
            }
        )
    )


if __name__ == "__main__":
    main()
