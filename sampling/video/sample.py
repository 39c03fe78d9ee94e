"""CLI: sample a video diffusion model from a checkpoint, optionally with
a long-video sampling scheme (reference: sampling/video/moving_mnist/
sample.py + extend.py command surface)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description="Sample a video diffusion model.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--sampling_steps", type=int, default=None)
    p.add_argument("--sampling_scheme_path", type=str, default="")
    p.add_argument("--output_path", type=str, default="output/video_samples")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import instantiate_from_config, load_yaml
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import create_train_state
    from xdiffusion_tpu.training.image.train import build_model
    from xdiffusion_tpu.training.video.train import save_gif
    from xdiffusion_tpu.utils import (
        normalize_to_neg_one_to_one,
        unnormalize_to_zero_to_one,
    )

    config = load_yaml(args.config_path)
    model = build_model(config)
    params = model.init_params(jax.random.PRNGKey(0))
    state = create_train_state(params, default_optimizer().build())
    state, step = checkpoints.restore_checkpoint(args.checkpoint, state)
    params = state.ema_params if state.ema_params is not None else state.params
    print(f"restored checkpoint @ step {step}", flush=True)

    os.makedirs(args.output_path, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    if not args.sampling_scheme_path:
        samples = model.sample(
            params,
            rng,
            num_samples=args.num_samples,
            num_sampling_steps=args.sampling_steps,
        )
        out = os.path.join(args.output_path, f"video-step{step}.gif")
        save_gif(np.asarray(samples), out)
        print(f"wrote {out}", flush=True)
        return

    # Long-video generation: windowed autoregressive scheme. Each window is
    # one jitted scan; the scheme splices generated frames into the next
    # window's conditioning (reference extend.py behavior).
    scheme_cfg = load_yaml(args.sampling_scheme_path)
    scheme = instantiate_from_config(scheme_cfg.sampling_scheme.to_dict())
    b = args.num_samples
    scheme.set_videos(list(range(b)))

    sn = config.diffusion.score_network.params
    f = int(sn.input_number_of_frames)
    s = int(sn.input_spatial_size)
    c = int(sn.input_channels)
    full = np.zeros((b, scheme.video_length, s, s, c), dtype=np.float32)

    for obs_idx, latent_idx, mask in scheme:
        window_frames = sorted(set(obs_idx[0]) | set(latent_idx[0]))
        # Conditioning window in model (normalized) space.
        x0 = normalize_to_neg_one_to_one(
            np.stack([full[i, window_frames] for i in range(b)])
        )
        # Pad the window to the model's frame count if needed.
        if x0.shape[1] < f:
            pad = f - x0.shape[1]
            x0 = np.concatenate([x0, np.zeros_like(x0[:, :pad])], axis=1)
            mask = np.concatenate(
                [mask, np.ones((b, pad), dtype=bool)], axis=1
            )
        rng, sub = jax.random.split(rng)
        window = model.sample(
            params,
            sub,
            num_samples=b,
            context={
                "video_mask": jnp.asarray(mask[:, :f]),
                "x0": jnp.asarray(x0[:, :f]),
            },
            num_sampling_steps=args.sampling_steps,
        )
        window = np.asarray(window)
        for rel, abs_idx in enumerate(window_frames[:f]):
            full[:, abs_idx] = window[:, rel]
        print(
            f"window done: obs={len(obs_idx[0])} latent={latent_idx[0][:3]}...",
            flush=True,
        )

    out = os.path.join(args.output_path, f"long-video-step{step}.gif")
    save_gif(full, out)
    print(f"wrote {out} ({scheme.video_length} frames)", flush=True)


if __name__ == "__main__":
    main()
