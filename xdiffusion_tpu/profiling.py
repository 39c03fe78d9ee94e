"""Tracing / profiling / numerical-debug hooks.

The reference has no tracing or sanitizers (SURVEY §5: only discarded
perf_counter locals and a disabled anomaly-detection switch). TPU-native
equivalents:

- `StepProfiler`: captures a `jax.profiler` trace (TensorBoard-compatible,
  includes XLA HLO + TPU hardware counters) over a configured window of
  training steps.
- `enable_nan_debugging`: the jax_debug_nans switch — every jitted program
  re-runs op-by-op on a NaN and raises at the producing op (the analogue of
  torch.autograd.set_detect_anomaly).
- `step_timer`: lightweight wall-clock step timing with device sync.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class StepProfiler:
    """Trace steps [start, start+count) into `logdir` for TensorBoard.

    Usage in a train loop:
        profiler = StepProfiler(out_dir, start_step=100, num_steps=5)
        for step in ...:
            profiler.maybe_start(step)
            ... run step ...
            profiler.maybe_stop(step)
    """

    def __init__(
        self,
        logdir: str,
        start_step: int = -1,
        num_steps: int = 3,
    ):
        self.logdir = os.path.join(logdir, "profile")
        self.start_step = int(start_step)
        self.num_steps = int(num_steps)
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.start_step >= 0 and step == self.start_step:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.start_step + self.num_steps - 1:
            self._stop()

    def close(self) -> None:
        """Flush an unfinished trace (run ended inside the window)."""
        if self._active:
            self._stop()

    def _stop(self) -> None:
        jax.profiler.stop_trace()
        self._active = False
        print(f"profiler trace written to {self.logdir}", flush=True)


@contextlib.contextmanager
def step_timer(sync: bool = True) -> Iterator[dict]:
    """Wall-clock timing with a device barrier at exit."""
    out = {}
    t0 = time.perf_counter()
    yield out
    if sync:
        jax.effects_barrier()
    out["seconds"] = time.perf_counter() - t0
