"""One-command migration of a PyTorch-reference checkpoint into this
framework: loads a torch state_dict (.pt / .pth / .safetensors / a
reference training checkpoint dict with a 'model_state_dict' key), maps
it through the zoo importer (importers/torch_state_dict.py — golden
forward parity for all 24 reference architectures), and writes an orbax
checkpoint that training/image/train.py --resume_from and the sampling
CLIs consume directly.

Reference checkpoint format: /root/reference/xdiffusion/training/image/
train.py save() writes {'model_state_dict': ..., 'optimizer_state_dict':
..., 'step': ...}; bare score-network state_dicts are accepted too.

Usage:
  python tools/import_torch_checkpoint.py \
      --config_path configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml \
      --torch_checkpoint /path/to/reference.pt \
      --output output/imported/ddpm_32x32
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_torch_state_dict(path: str):
    """Return a {name: np.ndarray} state_dict from a torch or safetensors
    file, unwrapping reference training-checkpoint dicts."""
    import numpy as np

    if path.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(path, framework="np") as f:
            return {k: f.get_tensor(k) for k in f.keys()}

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    # An EMA/raw module may be nested one more level.
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    assert isinstance(obj, dict), f"unrecognized checkpoint structure: {type(obj)}"
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def import_vae(args):
    """torch VAE state_dict -> VAETrainState orbax checkpoint, matching
    the structure the trainers restore (training/image/train.py:151-166,
    training/image/autoencoder.py VAETrainState)."""
    import jax
    import jax.numpy as jnp
    import optax

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import instantiate_from_config, load_yaml
    from xdiffusion_tpu.importers.autoencoders import (
        import_autoencoder_kl_params,
        import_hunyuan_vae_params,
        import_ltx_vae_params,
    )
    from xdiffusion_tpu.training.image.autoencoder import VAETrainState

    config = load_yaml(args.config_path)
    if "autoencoder" in config:
        vae_cfg = config.autoencoder
    else:
        vae_cfg = config.diffusion.latent_encoder
    vae = instantiate_from_config(vae_cfg.to_dict(), use_config_struct=True)
    params = vae.init_params(jax.random.PRNGKey(0))

    sd = load_torch_state_dict(args.torch_checkpoint)
    target = vae_cfg.target.lower()
    if "ltx" in target or "causalvideo" in target:
        fn = import_ltx_vae_params
    elif "hunyuan" in target:
        fn = import_hunyuan_vae_params
    else:
        fn = import_autoencoder_kl_params
    params = dict(params)
    params["ae"] = fn(params["ae"], sd, strict=not args.non_strict)

    state = VAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_ae=optax.adam(1e-4).init(params["ae"]),
        opt_disc=optax.adam(1e-4).init(params.get("disc", {})),
    )
    checkpoints.save_checkpoint(args.output, state, step=args.step)
    print(
        json.dumps(
            {
                "component": "vae",
                "importer": fn.__name__,
                "imported_torch_tensors": len(sd),
                "output": os.path.abspath(args.output),
                "step": args.step,
            }
        )
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--torch_checkpoint", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--step", type=int, default=0,
                   help="step number to record in the orbax checkpoint")
    p.add_argument("--non_strict", action="store_true",
                   help="allow unmapped torch keys (e.g. partial/EMA dumps)")
    p.add_argument(
        "--component", choices=["score_network", "vae"],
        default="score_network",
        help="score_network: the config's diffusion.score_network; vae: "
        "the config's autoencoder (VAE-trainer config) or "
        "diffusion.latent_encoder (latent-diffusion config), written as a "
        "VAETrainState consumable by --autoencoder_checkpoint/"
        "vae_checkpoint",
    )
    args = p.parse_args()

    if args.component == "vae":
        return import_vae(args)

    import jax

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.importers import import_score_network_params
    from xdiffusion_tpu.optim import default_optimizer
    from xdiffusion_tpu.parallel import create_train_state
    from xdiffusion_tpu.training.image.train import build_model

    config = load_yaml(args.config_path)
    model = build_model(config)
    params = model.init_params(jax.random.PRNGKey(0))

    sd = load_torch_state_dict(args.torch_checkpoint)
    n_torch = len(sd)
    params = import_score_network_params(
        config, params, sd, strict=not args.non_strict
    )

    state = create_train_state(params, default_optimizer().build(), ema=True)
    checkpoints.save_checkpoint(args.output, state, step=args.step)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print(
        json.dumps(
            {
                "imported_torch_tensors": n_torch,
                "flax_param_leaves": n_leaves,
                "output": os.path.abspath(args.output),
                "step": args.step,
            }
        )
    )


if __name__ == "__main__":
    main()
