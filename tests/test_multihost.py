"""Multi-host (multi-process) wiring test.

Launches TWO separate processes that form a real jax.distributed cluster
over the CPU backend (2 virtual devices each -> 4 global devices), build
a ('data',) mesh spanning both hosts, assemble per-host batch shards with
jax.make_array_from_process_local_data, and run one psum-reduced jitted
step. This is the single-box equivalent of a 2-host TPU pod launch
(SURVEY §2.14 multi-host spec).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "@@REPO@@")

coordinator = sys.argv[1]
pid = int(sys.argv[2])

from xdiffusion_tpu.parallel.distributed import (
    global_batch_from_local,
    is_main_process,
    local_batch_size,
    maybe_initialize_distributed,
)

assert maybe_initialize_distributed(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert is_main_process() == (pid == 0)

import numpy as np
import jax.numpy as jnp
from xdiffusion_tpu.parallel import make_mesh

mesh = make_mesh(axis_names=("data",), shape=(len(jax.devices()),))
GLOBAL_BATCH = 8
local = local_batch_size(GLOBAL_BATCH)
assert local == 4

# Each host contributes DISTINCT data; the global mean must see both.
x_local = np.full((local, 3), float(pid + 1), dtype=np.float32)
batch = global_batch_from_local({"x": x_local}, mesh)
assert batch["x"].shape == (GLOBAL_BATCH, 3)

from jax.sharding import NamedSharding, PartitionSpec as P

@jax.jit
def global_mean(b):
    return jnp.mean(b["x"])

m = float(global_mean(batch))
assert abs(m - 1.5) < 1e-6, m
print(f"proc {pid} OK mean={m}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_data_parallel_cluster(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.replace("@@REPO@@", repo))
    coordinator = f"127.0.0.1:{_free_port()}"

    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out, out
