"""A/B the batch-chunked forward (ops/batch_chunk.py) across batch sizes.

Measures end-to-end samples/sec/chip for 50-step DDIM sampling of the
flagship DDPM-MNIST model at batch 64..512 with chunking off
(XDIFFUSION_FORWARD_CHUNK=0) vs on (chunk=64, the default). This is
the measurement behind the layout-flip fix: XLA moves activations to a
batch-minor layout at batch>=256, collapsing achieved bandwidth; the
lax.map chunked forward keeps the channels-minor small-batch layout.

Prints one JSON line per batch plus a summary with the monotonicity
verdict (VERDICT round-2 item 7).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

STEPS = 50
REPEATS = 4
BATCHES = (64, 128, 256, 512)


def main():
    import jax
    import numpy as np

    from xdiffusion_tpu.config import load_yaml
    from xdiffusion_tpu.diffusion.ddpm import GaussianDiffusion_DDPM
    from xdiffusion_tpu.samplers.ddim import DDIMSampler

    config_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml",
    )
    config = load_yaml(config_path)
    config.diffusion.score_network.params.to_dict()["dtype"] = "bfloat16"
    model = GaussianDiffusion_DDPM(config)
    params = model.init_params(jax.random.PRNGKey(0))
    n_chips = len(jax.devices())
    sampler = DDIMSampler()

    def measure(batch):
        def run(seed):
            return model.sample(
                params, jax.random.PRNGKey(seed), num_samples=batch,
                num_sampling_steps=STEPS, sampler=sampler,
            )

        np.asarray(run(0))  # warmup/compile (forced fetch: tunnel under-syncs)
        t0 = time.perf_counter()
        for i in range(1, REPEATS + 1):
            out = run(i)
        np.asarray(out)
        return batch * REPEATS / (time.perf_counter() - t0) / n_chips

    rows = []
    for batch in BATCHES:
        os.environ["XDIFFUSION_FORWARD_CHUNK"] = "0"
        model._sample_fn_cache.clear()
        sps_unchunked = measure(batch)
        os.environ["XDIFFUSION_FORWARD_CHUNK"] = "64"
        model._sample_fn_cache.clear()
        sps_chunked = measure(batch)
        model._sample_fn_cache.clear()
        row = {
            "batch": batch,
            "sps_unchunked": round(sps_unchunked, 2),
            "sps_chunked": round(sps_chunked, 2),
            "sps": round(max(sps_unchunked, sps_chunked), 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    def _monotone(key):
        vals = [r[key] for r in rows]
        return all(b >= a * 0.995 for a, b in zip(vals, vals[1:]))

    print(json.dumps({
        "monotone_chunked": _monotone("sps_chunked"),
        "monotone_unchunked": _monotone("sps_unchunked"),
        "ratio_512_over_64_chunked": round(
            rows[-1]["sps_chunked"] / rows[0]["sps_chunked"], 3),
        "ratio_512_over_64_unchunked": round(
            rows[-1]["sps_unchunked"] / rows[0]["sps_unchunked"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
