"""CLI: autoregressively extend a video beyond the training length
(reference command surface: sampling/video/moving_mnist/extend.py —
--reconstruction_guidance / --num_frame_overlap). The last
`num_frame_overlap` generated frames condition each new chunk, either by
hard pinning (video_mask) or reconstruction guidance (gradient of the
overlap reconstruction error through the denoiser)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Extend a video autoregressively.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--num_samples", type=int, default=2)
    p.add_argument("--total_frames", type=int, default=32)
    p.add_argument("--num_frame_overlap", type=int, default=4)
    p.add_argument("--reconstruction_guidance", action="store_true")
    p.add_argument("--guidance_omega", type=float, default=2.0)
    p.add_argument("--sampling_steps", type=int, default=0)
    p.add_argument("--output_path", type=str, default="output/extended")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args()

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import create_train_state
    from xdiffusion_tpu.samplers.ancestral import AncestralSampler
    from xdiffusion_tpu.training.image.train import (
        _is_text_conditional,
        build_model,
    )
    from xdiffusion_tpu.training.video.train import save_gif

    config = load_yaml(args.config_path)
    model = build_model(config)
    frames_per_chunk = int(
        config.diffusion.score_network.params.input_number_of_frames
    )
    overlap = int(args.num_frame_overlap)
    assert 0 < overlap < frames_per_chunk

    params = model.init_params(jax.random.PRNGKey(0))
    state = create_train_state(params, default_optimizer().build())
    state, step = checkpoints.restore_checkpoint(args.checkpoint, state)
    params = state.ema_params if state.ema_params is not None else state.params
    print(f"restored checkpoint @ step {step}", flush=True)

    context = {}
    if _is_text_conditional(model):
        context["text_prompts"] = [
            str(i % 10) for i in range(args.num_samples)
        ]
    sample_kwargs = dict(context=dict(context))
    if args.sampling_steps:
        sample_kwargs["num_sampling_steps"] = args.sampling_steps

    rng = jax.random.PRNGKey(args.seed)
    rng, chunk_rng = jax.random.split(rng)
    video = np.asarray(
        model.sample(params, chunk_rng, num_samples=args.num_samples,
                     **sample_kwargs)
    )

    sampler = None
    if args.reconstruction_guidance:
        sampler = AncestralSampler(
            reconstruction_guidance=True,
            omega=args.guidance_omega,
            num_frame_overlap=overlap,
        )

    while video.shape[1] < args.total_frames:
        rng, chunk_rng = jax.random.split(rng)
        tail = jnp.asarray(video[:, -overlap:])
        chunk_context = dict(context)
        if args.reconstruction_guidance:
            # Soft conditioning: guide the first `overlap` generated frames
            # toward the tail (x_a holds the conditioning frames in model
            # space; the sampler reads its last num_frame_overlap frames).
            chunk_context["x_a"] = tail * 2.0 - 1.0
        else:
            # Hard conditioning: pin the overlap frames via the video mask
            # (True = generate).
            mask = jnp.ones(
                (args.num_samples, frames_per_chunk), dtype=bool
            ).at[:, :overlap].set(False)
            x0 = jnp.pad(
                tail * 2.0 - 1.0,
                ((0, 0), (0, frames_per_chunk - overlap),
                 (0, 0), (0, 0), (0, 0)),
            )
            chunk_context["video_mask"] = mask
            chunk_context["x0"] = x0
        kwargs = dict(sample_kwargs)
        kwargs["context"] = chunk_context
        if sampler is not None:
            kwargs["sampler"] = sampler
        chunk = np.asarray(
            model.sample(params, chunk_rng, num_samples=args.num_samples,
                         **kwargs)
        )
        video = np.concatenate([video, chunk[:, overlap:]], axis=1)
        print(f"extended to {video.shape[1]} frames", flush=True)

    video = video[:, : args.total_frames]
    os.makedirs(args.output_path, exist_ok=True)
    out = os.path.join(args.output_path, f"extended-{video.shape[1]}f.gif")
    save_gif(video, out)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
