"""Shared training-loop utilities: sample grids, metric logging."""

from __future__ import annotations

import json
import math
import os
import time
from typing import Dict, Optional

import numpy as np


def save_image_grid(samples: np.ndarray, path: str, cols: Optional[int] = None):
    """Save an (N, H, W, C) [0,1] batch as a tiled PNG grid."""
    from PIL import Image

    samples = np.asarray(samples)
    n, h, w, c = samples.shape
    cols = cols or int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, c), dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = samples[i]
    grid = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
    if c == 1:
        img = Image.fromarray(grid[..., 0], mode="L")
    else:
        img = Image.fromarray(grid)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img.save(path)


class MetricsLogger:
    """JSONL step metrics + TensorBoard scalars + console progress
    (the reference's SummaryWriter/tqdm role — reference
    training/image/train.py:90-95,389 — SURVEY §5 observability).

    TensorBoard events go to <output_path>/tensorboard via the
    dependency-free writer (xdiffusion_tpu/tensorboard.py); set
    XDIFFUSION_TENSORBOARD=0 to disable."""

    def __init__(self, output_path: str, print_every: int = 100):
        os.makedirs(output_path, exist_ok=True)
        self._file = open(os.path.join(output_path, "metrics.jsonl"), "a")
        self._print_every = print_every
        self._t0 = time.time()
        self._last_print = self._t0
        self._last_step = 0
        self._tb = None
        if os.environ.get("XDIFFUSION_TENSORBOARD", "1") != "0":
            from xdiffusion_tpu.tensorboard import TensorBoardWriter

            self._tb = TensorBoardWriter(
                os.path.join(output_path, "tensorboard")
            )

    def log(self, step: int, metrics: Dict[str, float]):
        record = {"step": step, "time": time.time() - self._t0}
        record.update({k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if step % self._print_every == 0:
            now = time.time()
            sps = (step - self._last_step) / max(now - self._last_print, 1e-9)
            self._last_print, self._last_step = now, step
            items = " ".join(f"{k}={v:.4g}" for k, v in metrics.items())
            print(f"step {step} | {sps:.2f} steps/s | {items}", flush=True)
            self._file.flush()
            if self._tb is not None:
                self._tb.flush()

    def log_image_grid(self, tag: str, samples: np.ndarray, step: int,
                       cols: Optional[int] = None):
        """Tile (N, H, W, C) samples and log to TensorBoard (the
        reference's add_image on sample grids)."""
        if self._tb is None:
            return
        samples = np.asarray(samples)
        n, h, w, c = samples.shape
        cols = cols or int(math.ceil(math.sqrt(n)))
        rows = int(math.ceil(n / cols))
        grid = np.zeros((rows * h, cols * w, c), dtype=np.float32)
        for i in range(n):
            r, col = divmod(i, cols)
            grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = samples[i]
        self._tb.add_image(tag, grid, step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
