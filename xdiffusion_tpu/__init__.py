"""xdiffusion_tpu: a TPU-native (JAX/XLA/Pallas) multimodal diffusion framework.

A ground-up rebuild of the capabilities of the xdiffusion reference
(image/video/audio diffusion, YAML-config driven), designed TPU-first:

- All compute paths are jittable pure functions (single fused XLA programs).
- Denoising loops are `lax.scan` programs with zero host round-trips per step.
- Scaling is expressed with `jax.sharding.Mesh` + NamedSharding (DP/FSDP axes),
  not wrapper-based DDP.
- Hot ops (attention, normalization) route through Pallas TPU kernels with
  pure-XLA fallbacks for small shapes / non-TPU backends.

Package map:
  config.py       YAML -> DotConfig, reflective `target:`/`params:` instantiation
                  with a registry that also resolves reference-style
                  `xdiffusion.*` dotted paths (config compatibility).
  scheduler.py    forward-process noise schedulers (discrete, continuous logSNR,
                  rectified flow) as immutable pytrees.
  diffusion/      diffusion processes (DDPM/continuous/rectified-flow, ...).
  samplers/       reverse-process samplers as scan-compatible step functions.
  score_networks/ the model zoo (UNet, DiT, ...), flax.linen, NHWC layout.
  layers/         shared neural building blocks.
  ops/            Pallas TPU kernels + XLA fallbacks.
  parallel/       mesh construction, sharding rules, distributed train steps.
  datasets/       host input pipeline feeding device-resident batches.
  training/       train loops (jitted step + eval sampling + checkpointing).
"""

__version__ = "0.1.0"


def _default_compilation_cache() -> None:
    """Persistent XLA compilation cache, on by default.

    Chunked/scanned sampler programs can take minutes to compile the
    first time (docs/performance.md "Batch scaling"); the cache makes
    that a once-per-shape cost across processes. Explicit user settings
    (JAX_COMPILATION_CACHE_DIR env, or jax.config set before import)
    always win; XDIFFUSION_NO_COMPILE_CACHE=1 opts out entirely.
    """
    import os

    if os.environ.get("XDIFFUSION_NO_COMPILE_CACHE") == "1":
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.expanduser("~/.cache/xdiffusion"), "jax"),
        )
    except Exception:  # pragma: no cover - never fatal for import
        pass


_default_compilation_cache()
