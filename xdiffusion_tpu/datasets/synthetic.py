"""Deterministic synthetic digit images (MNIST stand-in for offline envs).

Renders 0-9 from a 5x7 bitmap font with random per-sample shift, scale
jitter, and smoothing, seeded deterministically per split. Same shape
contract as MNIST: (N, 28, 28, 1) float-convertible uint8 + labels.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# 5x7 glyphs, rows top->bottom, '#' = on.
_GLYPHS = {
    0: ["#####", "#...#", "#...#", "#...#", "#...#", "#...#", "#####"],
    1: ["..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."],
    2: ["#####", "....#", "....#", "#####", "#....", "#....", "#####"],
    3: ["#####", "....#", "....#", ".####", "....#", "....#", "#####"],
    4: ["#...#", "#...#", "#...#", "#####", "....#", "....#", "....#"],
    5: ["#####", "#....", "#....", "#####", "....#", "....#", "#####"],
    6: ["#####", "#....", "#....", "#####", "#...#", "#...#", "#####"],
    7: ["#####", "....#", "...#.", "..#..", "..#..", ".#...", ".#..."],
    8: ["#####", "#...#", "#...#", "#####", "#...#", "#...#", "#####"],
    9: ["#####", "#...#", "#...#", "#####", "....#", "....#", "#####"],
}


def _glyph_array(d: int) -> np.ndarray:
    return np.array(
        [[1.0 if ch == "#" else 0.0 for ch in row] for row in _GLYPHS[d]],
        dtype=np.float32,
    )


def _smooth(img: np.ndarray) -> np.ndarray:
    """3x3 box blur to soften the bitmap edges (MNIST-ish strokes)."""
    padded = np.pad(img, 1)
    out = np.zeros_like(img)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w = 0.4 if (dy == 0 and dx == 0) else 0.075
            out += w * padded[1 + dy : 1 + dy + img.shape[0],
                              1 + dx : 1 + dx + img.shape[1]]
    return out


def generate_digits(
    num_samples: int, seed: int = 0, image_size: int = 28
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images uint8 (N, S, S, 1), labels int32 (N,))."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, size=num_samples).astype(np.int32)
    images = np.zeros((num_samples, image_size, image_size, 1), dtype=np.uint8)
    # Upscale factors are jittered but capped so glyphs fit any canvas
    # (glyph bitmaps are 7 rows x 5 cols).
    fy_hi = max(2, min(4, image_size // 7 + 1))
    fx_hi = max(2, min(4, image_size // 5 + 1))
    for i, lab in enumerate(labels):
        g = _glyph_array(int(lab))
        fy = int(rng.integers(1, fy_hi))
        fx = int(rng.integers(1, fx_hi))
        big = np.kron(g, np.ones((fy, fx), dtype=np.float32))
        big = _smooth(big)
        big = np.clip(big * float(rng.uniform(0.75, 1.0)), 0.0, 1.0)
        big = big[:image_size, :image_size]  # hard cap for tiny canvases
        h, w = big.shape
        max_y = image_size - h
        max_x = image_size - w
        oy = int(rng.integers(0, max(1, max_y)))
        ox = int(rng.integers(0, max(1, max_x)))
        canvas = np.zeros((image_size, image_size), dtype=np.float32)
        canvas[oy : oy + h, ox : ox + w] = big
        images[i, :, :, 0] = (canvas * 255).astype(np.uint8)
    return images, labels
