"""Reverse-process samplers as `lax.scan`-compatible step functions.

Counterpart of the reference sampler zoo (/root/reference/xdiffusion/
samplers/), redesigned around the north-star requirement: the entire
denoising loop is ONE jitted `lax.scan` program with zero host round-trips
per step. Each sampler provides:

- `step_context(process, num_steps, batch)`: precomputed per-step scalar
  arrays (timesteps, logSNRs, last-step flags) with leading axis T, scanned
  by the loop builder in `diffusion.sampling`.
- `p_sample(...)`: the pure single-step update, traced once into the scan
  body. Classifier-free guidance runs as a single 2x-batched forward, not
  two sequential model calls.
"""

from xdiffusion_tpu.samplers.base import ReverseProcessSampler  # noqa: F401
