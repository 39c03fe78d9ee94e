"""CLI: sample from a trained image diffusion checkpoint.

Mirrors the reference command surface (reference sampling/image/mnist/
sample.py:188-196): --config_path, --checkpoint, --num_samples,
--guidance, --sampling_steps, --sampler_config_path.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser(description="Sample an image diffusion model.")
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--guidance", type=float, default=None)
    p.add_argument("--sampling_steps", type=int, default=None)
    p.add_argument("--sampler_config_path", type=str, default="")
    p.add_argument("--output_path", type=str, default="output/samples")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lora_weights", "--lora_path", type=str, default="",
                   help="path to lora_weights.pkl saved by "
                        "--use_lora_training; merged before sampling")
    p.add_argument("--text_prompts", type=str, default="",
                   help="comma-separated prompts for text-conditional models")
    args = p.parse_args()

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import instantiate_from_config, load_yaml
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import create_train_state
    from xdiffusion_tpu.training.common import save_image_grid
    from xdiffusion_tpu.training.image.train import build_model

    config = load_yaml(args.config_path)
    model = build_model(config)

    params = model.init_params(jax.random.PRNGKey(0))
    state = create_train_state(params, default_optimizer().build())
    state, step = checkpoints.restore_checkpoint(args.checkpoint, state)
    print(f"restored checkpoint @ step {step}", flush=True)
    params = state.ema_params if state.ema_params is not None else state.params
    if args.lora_weights:
        from xdiffusion_tpu import lora as lora_lib

        lora = lora_lib.load_lora_weights(args.lora_weights)
        params = lora_lib.merge_lora(params, lora)
        print(
            f"merged LoRA ({lora_lib.lora_param_count(lora)/1e6:.3f}M params, "
            f"rank {lora['rank']})",
            flush=True,
        )

    sampler = None
    if args.sampler_config_path:
        sampler_cfg = load_yaml(args.sampler_config_path)
        sampler = instantiate_from_config(sampler_cfg.sampling.to_dict())

    context = {}
    if args.text_prompts:
        prompts = [s.strip() for s in args.text_prompts.split(",")]
        context["text_prompts"] = (
            prompts * (args.num_samples // len(prompts) + 1)
        )[: args.num_samples]
    if config.diffusion.score_network.params.is_class_conditional:
        context["classes"] = jax.numpy.asarray(
            np.arange(args.num_samples, dtype=np.int32) % 10
        )

    samples = model.sample(
        params,
        jax.random.PRNGKey(args.seed),
        num_samples=args.num_samples,
        context=context,
        classifier_free_guidance=args.guidance,
        num_sampling_steps=args.sampling_steps,
        sampler=sampler,
    )
    os.makedirs(args.output_path, exist_ok=True)
    out = os.path.join(args.output_path, f"sample-step{step}.png")
    save_image_grid(np.asarray(samples), out)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
