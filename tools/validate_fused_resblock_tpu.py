"""On-chip validation of the fused resblock kernel (ops/fused_resblock):
Pallas vs XLA reference at the flagship UNet's real shapes and dtypes.
Interpret-mode tests prove the algorithm; this proves the Mosaic
lowering on actual hardware. Prints one JSON line per shape.
"""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.ops.fused_resblock import (
    _eligible, _pallas_call, _xla_impl,
)

# (B, H, W, C, Co): the flagship DDPM-MNIST UNet's block shapes at
# batch 64, plus a batch-512 stressor and a video-folded shape.
SHAPES = [
    (64, 32, 32, 128, 128),
    (64, 16, 16, 256, 256),
    (64, 8, 8, 256, 256),
    (512, 16, 16, 256, 256),
    (32, 32, 32, 128, 256),  # channel change (conv1 after downsample)
    (8 * 16, 32, 32, 128, 128),  # video: 16 frames folded
]


def main():
    ok_all = True
    for dtype in (jnp.bfloat16, jnp.float32):
        for b, h, w, c, co in SHAPES:
            key = jax.random.PRNGKey(0)
            x = jax.random.normal(key, (b, h, w, c), dtype)
            a = (jax.random.normal(jax.random.fold_in(key, 1), (b, c),
                                   jnp.float32) * 0.2 + 1.0)
            off = jax.random.normal(jax.random.fold_in(key, 2), (b, c),
                                    jnp.float32) * 0.1
            kw = jax.random.normal(jax.random.fold_in(key, 3),
                                   (3, 3, c, co), dtype) * 0.05
            bias = jax.random.normal(jax.random.fold_in(key, 4), (co,),
                                     jnp.float32) * 0.1
            res = jax.random.normal(jax.random.fold_in(key, 5),
                                    (b, h, w, co), dtype)
            if not _eligible(x, co, res):
                print(json.dumps({"shape": [b, h, w, c, co],
                                  "dtype": str(dtype.__name__),
                                  "eligible": False}))
                continue
            got = np.asarray(
                jax.jit(lambda *o: _pallas_call(*o, True))(
                    x, a, off, kw, bias, res
                ), dtype=np.float32)
            want = np.asarray(
                jax.jit(lambda *o: _xla_impl(*o, True))(
                    x, a, off, kw, bias, res
                ), dtype=np.float32)
            scale = float(np.abs(want).max()) or 1.0
            err = float(np.abs(got - want).max()) / scale
            tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
            ok = err < tol
            ok_all &= ok
            print(json.dumps({
                "shape": [b, h, w, c, co], "dtype": str(dtype.__name__),
                "rel_err_max": round(err, 6), "ok": ok,
            }), flush=True)
    print(json.dumps({"fused_resblock_tpu_validation": ok_all}))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
