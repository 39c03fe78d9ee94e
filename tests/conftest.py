"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
paths (Mesh/pjit) are exercised without TPU hardware — the TPU-world
equivalent of multi-node simulation.

Note: this environment's sitecustomize registers the `axon` TPU backend at
interpreter start and exports JAX_PLATFORMS=axon, so the env var alone is
not enough — we must also update jax.config BEFORE any backend
initialization (first jax.devices()/array op).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: per-compile latency in this environment is
# ~0.5-1.5s, so caching across pytest runs saves minutes.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".cache", "jax")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
# Skip the startup model-summary table in e2e trainer tests (it re-traces
# the score network just to render a table; tests cover it directly in
# tests/test_summary.py).
os.environ.setdefault("XDIFFUSION_MODEL_SUMMARY", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
