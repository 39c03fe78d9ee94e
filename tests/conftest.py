"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
paths (Mesh/pjit) are exercised without TPU hardware — the TPU-world
equivalent of multi-node simulation. Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compile times snappy for tiny test models.
os.environ.setdefault("JAX_ENABLE_X64", "0")
