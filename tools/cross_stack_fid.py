"""Cross-stack quality verification: a flagship model TRAINED in this
framework is exported to the PyTorch reference stack
(importers/export_torch.py), both stacks run the config's default
(ancestral) sampler from IDENTICAL initial noise with an IDENTICAL
injected per-step noise sequence, and both sample sets are scored with
the SAME FID extractor against the same real set. With shared weights
and shared noise the trajectories agree to numerics, so the pixel MAE
is reported as a tight secondary metric (measured 0.0 in the fp32
random-weights dry run).

This is the offline-feasible realization of the BASELINE north star
"FID within 2% of the PyTorch reference" (reference sampling loop:
/root/reference/xdiffusion/diffusion/ddpm.py:866-987): the reference
publishes no FID of its own, so the comparison is run on shared weights
— any FID gap between the stacks is pure numerics/sampler divergence.

Prints one JSON line:
  {"fid_tpu": ..., "fid_torch": ..., "fid_delta_pct": ...,
   "cross_stack_pixel_mae": ..., ...}
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    # The torch side must instantiate the reference's OWN classes; our
    # YAML's targets point at xdiffusion_tpu.*. Defaults to the same
    # relative config under /root/reference.
    p.add_argument("--ref_config_path", type=str, default=None)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--dataset_name", type=str, default="image/mnist")
    p.add_argument("--num_samples", type=int, default=2048)
    p.add_argument("--sampling_steps", type=int, default=50)
    p.add_argument("--sample_batch", type=int, default=256)
    p.add_argument("--torch_batch", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--extractor_steps", type=int, default=500)
    args = p.parse_args()

    import numpy as np

    import jax

    from xdiffusion_tpu import checkpoints
    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.datasets.utils import load_dataset
    from xdiffusion_tpu.eval.fid import compute_fid, train_feature_extractor
    from xdiffusion_tpu.importers.export_torch import export_unet_params
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
        state.ema_params if getattr(state, "ema_params", None) else state.params
    )
    print(f"restored step {step}", flush=True)

    # Shared initial noise AND shared per-step noise per batch (CHW for
    # torch, HWC for us). Both stacks run the config's DEFAULT sampler
    # (ancestral for the discrete flagship — the reference's DDIM sampler
    # requires logsnr_t, which its discrete scheduler never provides, so
    # ancestral is the only sampler the torch stack can actually run
    # here); with identical weights and identical noise sequences the two
    # trajectories should agree to numerics, making the pixel MAE a tight
    # cross-stack metric alongside the FID delta.
    rng = np.random.default_rng(args.seed)
    noise_batches = []
    step_noise_batches = []
    n_done = 0
    while n_done < args.num_samples:
        b = min(args.sample_batch, args.num_samples - n_done)
        noise_batches.append(
            rng.standard_normal((b, 1, 32, 32), dtype=np.float32)
        )
        step_noise_batches.append(
            rng.standard_normal(
                (args.sampling_steps, b, 1, 32, 32), dtype=np.float32
            )
        )
        n_done += b

    # --- our stack ---
    ours = []
    for i, (noise, snoise) in enumerate(
        zip(noise_batches, step_noise_batches)
    ):
        out = model.sample(
            sample_params,
            jax.random.PRNGKey(args.seed + i),
            num_samples=noise.shape[0],
            context={
                "sampling_noise": np.transpose(snoise, (0, 1, 3, 4, 2))
            },
            num_sampling_steps=args.sampling_steps,
            initial_noise=np.transpose(noise, (0, 2, 3, 1)),
        )
        ours.append(np.asarray(out))
        print(f"tpu sampled {sum(o.shape[0] for o in ours)}", flush=True)
    ours = np.concatenate(ours, axis=0)

    # --- reference torch stack, identical weights ---
    import torch

    from reference_helpers import import_reference

    import_reference()
    from xdiffusion.diffusion.ddpm import GaussianDiffusion_DDPM as RefDDPM
    from xdiffusion.utils import load_yaml as ref_load_yaml

    ref_config_path = args.ref_config_path
    if ref_config_path is None:
        rel = os.path.relpath(
            os.path.abspath(args.config_path),
            os.path.join(os.path.dirname(__file__), "..", "configs"),
        )
        ref_config_path = os.path.join("/root/reference/configs", rel)
    ref_model = RefDDPM(ref_load_yaml(ref_config_path))
    sd = export_unet_params(sample_params)
    ref_keys = ref_model._score_network.state_dict().keys()
    for key in ref_keys:
        if key not in sd:
            idx = key.find("_projections.")
            if idx > 0 and key[idx:] in sd:
                sd[key] = sd[key[idx:]]
    missing = [k for k in ref_keys if k not in sd]
    assert not missing, f"export missing {missing[:5]}"
    ref_model._score_network.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    )
    ref_model.eval()

    # Inject the SAME per-step noise sequence the jax stack consumed (the
    # reference sampler draws torch.randn_like once per reverse step).
    theirs = []
    orig_randn_like = torch.randn_like
    try:
        with torch.no_grad():
            for noise, snoise in zip(noise_batches, step_noise_batches):
                for s in range(0, noise.shape[0], args.torch_batch):
                    chunk = noise[s : s + args.torch_batch]
                    queue = [
                        torch.from_numpy(n[s : s + args.torch_batch])
                        for n in snoise
                    ]

                    def fake_randn_like(x, *a, _q=queue, **k):
                        if _q and _q[0].shape == x.shape:
                            return _q.pop(0).to(x.dtype)
                        return orig_randn_like(x, *a, **k)

                    torch.randn_like = fake_randn_like
                    out, _ = ref_model.sample(
                        context={},
                        num_samples=chunk.shape[0],
                        num_sampling_steps=args.sampling_steps,
                        initial_noise=torch.from_numpy(chunk),
                    )
                    theirs.append(out.numpy())
                    print(
                        f"torch sampled {sum(o.shape[0] for o in theirs)}",
                        flush=True,
                    )
    finally:
        torch.randn_like = orig_randn_like
    theirs = np.concatenate(theirs, axis=0)
    theirs_hwc = np.transpose(theirs, (0, 2, 3, 1))

    # --- shared extractor, shared real set ---
    dataset, _ = load_dataset(args.dataset_name, config=config, split="train")
    drng = np.random.default_rng(args.seed)
    idx = drng.permutation(len(dataset))[: 2 * args.num_samples]
    real = np.stack([np.asarray(dataset[int(j)][0]) for j in idx])
    if real.ndim == 3:
        real = real[..., None]
    labels = np.asarray([dataset[int(j)][1] for j in idx])
    real_fid = real[: args.num_samples]
    real_holdout = real[args.num_samples :]
    m, pa, _ = train_feature_extractor(
        real_fid, labels[: args.num_samples], steps=args.extractor_steps
    )
    extractor = (m, pa)

    fid_tpu = compute_fid(real_fid, ours, extractor=extractor)
    fid_torch = compute_fid(real_fid, theirs_hwc, extractor=extractor)
    floor = compute_fid(real_fid, real_holdout, extractor=extractor)
    mae = float(np.mean(np.abs(ours - theirs_hwc)))
    denom = max(abs(fid_torch), 1e-9)
    print(
        json.dumps(
            {
                "fid_tpu": round(fid_tpu, 3),
                "fid_torch": round(fid_torch, 3),
                "fid_delta_pct": round(
                    100.0 * (fid_tpu - fid_torch) / denom, 3
                ),
                "fid_floor_real_vs_real": round(floor, 3),
                "cross_stack_pixel_mae": round(mae, 6),
                "num_samples": args.num_samples,
                "sampling_steps": args.sampling_steps,
                "checkpoint_step": int(step),
            }
        )
    )


if __name__ == "__main__":
    main()
