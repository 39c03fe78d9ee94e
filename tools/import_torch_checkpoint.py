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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--torch_checkpoint", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--step", type=int, default=0,
                   help="step number to record in the orbax checkpoint")
    p.add_argument("--non_strict", action="store_true",
                   help="allow unmapped torch keys (e.g. partial/EMA dumps)")
    args = p.parse_args()

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
