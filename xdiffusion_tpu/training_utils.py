"""Video training batch preparation (joint image/video, FDM masking).

Behavioral counterpart of /root/reference/xdiffusion/training_utils.py:
14-308: `preprocess_training_videos` resizes / frame-samples raw videos to
the model's input shape and generates frame masks; `get_training_batch`
synthesizes pseudo-image batches (single random frame) for joint
image/video training; `fdm_random_mask` implements the Flexible Diffusion
Modeling random observed/latent index sampler.

All host-side numpy (pipeline work); outputs feed the jitted step.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def fdm_random_mask(
    batch: int, num_frames: int, rng: Optional[np.random.Generator] = None,
    max_obs: Optional[int] = None,
) -> np.ndarray:
    """FDM-style random observed-frame masks (arXiv:2205.11495): for each
    example, a random subset (possibly empty) of frames is observed. Mask
    True = generate, False = condition."""
    rng = rng or np.random.default_rng()
    max_obs = max_obs if max_obs is not None else num_frames - 1
    masks = np.ones((batch, num_frames), dtype=bool)
    for b in range(batch):
        n_obs = int(rng.integers(0, max_obs + 1))
        if n_obs > 0:
            obs = rng.choice(num_frames, size=n_obs, replace=False)
            masks[b, obs] = False
    return masks


def _sample_some_indices(
    rng: np.random.Generator, max_indices: int, num_frames: int
) -> list:
    """Geometric-spaced random frame-index subsets (reference
    training_utils.py:250-265)."""
    s = int(rng.integers(1, max_indices + 1))
    max_scale = num_frames / (s - 0.999)
    scale = np.exp(rng.random() * np.log(max_scale))
    pos = rng.random() * (num_frames - scale * (s - 1))
    indices = [int(pos + i * scale) for i in range(s)]
    if all(0 <= i < num_frames for i in indices):
        return indices
    return _sample_some_indices(rng, max_indices, num_frames)


def sample_fdm_training_batch(
    videos: np.ndarray,
    max_frames: int,
    method: str = "random",
    rng: Optional[np.random.Generator] = None,
):
    """Flexible-Diffusion-Modeling batch sampling (arXiv:2205.11495;
    reference training_utils.py:14-113): per example, draw random latent
    (generated) and observed (conditioning) frame subsets from the source
    clip, gather the selected frames, pad with random frames, and return
    their source indices for the frame-index RPE conditioning.

    videos: (B, T, H, W, C). Returns (videos' (B, N, H, W, C),
    frame_indices (B, N) int32, observed_mask (B, N) float32,
    latent_mask (B, N) float32)."""
    rng = rng or np.random.default_rng()
    b, t = videos.shape[:2]
    n = max_frames

    if method == "uniform":
        v = videos[:, :n]
        fi = np.tile(np.arange(n, dtype=np.int32)[None], (b, 1))
        return (
            v,
            fi,
            np.zeros((b, n), np.float32),
            np.ones((b, n), np.float32),
        )

    obs = np.zeros((b, t), np.float32)
    lat = np.zeros((b, t), np.float32)
    for i in range(b):
        lat[i, _sample_some_indices(rng, n, t)] = 1.0
        while True:
            remaining = n - obs[i].sum() - lat[i].sum()
            if remaining <= 0:
                # Every slot taken (t == n edge): the reference's loop
                # condition alone would spin forever here.
                break
            mask = obs[i] if rng.random() < 0.5 else lat[i]
            idx = np.asarray(_sample_some_indices(rng, n, t))
            idx = idx[(obs[i, idx] + lat[i, idx]) == 0]
            if len(idx) > remaining:
                break
            mask[idx] = 1.0

    any_mask = np.clip(obs + lat, 0.0, 1.0)
    fi = np.zeros((b, n), np.int64)
    new_v = np.zeros((b, n) + videos.shape[2:], videos.dtype)
    new_obs = np.zeros((b, n), np.float32)
    new_lat = np.zeros((b, n), np.float32)
    for i in range(b):
        sel = np.nonzero(any_mask[i])[0]
        k = len(sel)
        fi[i, :k] = sel
        if k < n:
            fi[i, k:] = rng.integers(0, t, size=n - k)
        new_v[i] = videos[i][fi[i]]
        new_obs[i] = obs[i][fi[i]]
        new_lat[i] = lat[i][fi[i]]
    return new_v, fi.astype(np.int32), new_obs, new_lat


def _resize_video(videos: np.ndarray, size: int) -> np.ndarray:
    """(B, F, H, W, C) -> (B, F, size, size, C), bilinear (host, one-off)."""
    b, f, h, w, c = videos.shape
    if h == size and w == size:
        return videos
    import jax
    import jax.numpy as jnp

    out = jax.image.resize(
        jnp.asarray(videos), (b, f, size, size, c), method="bilinear"
    )
    return np.asarray(out)


def preprocess_training_videos(
    videos: np.ndarray,
    config,
    mask_generator=None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, Dict]:
    """Resize + clip/sample frames to the model's input shape; generate
    per-example frame masks (reference training_utils.py:154-247).

    videos: (B, F, H, W, C) float [0,1]. Returns (videos', context_update).
    """
    rng = rng or np.random.default_rng()
    sn = config.diffusion.score_network.params
    target_frames = int(sn.get("input_number_of_frames", videos.shape[1]))
    target_size = int(
        sn.input_spatial_size
        if not isinstance(sn.input_spatial_size, list)
        else sn.input_spatial_size[0]
    )

    b, f = videos.shape[:2]
    if f > target_frames:
        start = int(rng.integers(0, f - target_frames + 1))
        videos = videos[:, start : start + target_frames]
    elif f < target_frames:
        reps = -(-target_frames // f)
        videos = np.tile(videos, (1, reps, 1, 1, 1))[:, :target_frames]
    videos = _resize_video(videos, target_size)

    context: Dict = {
        "frame_indices": np.tile(
            np.arange(target_frames, dtype=np.int32)[None], (b, 1)
        ),
    }
    if mask_generator is not None:
        mask = mask_generator.get_masks(videos.shape, rng=rng)
        context["video_mask"] = mask
        context["x0"] = None  # filled by the caller with normalized frames
    return videos, context


def get_training_batch(
    videos: np.ndarray,
    is_image_batch: bool,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Joint image/video training (reference training_utils.py:116-151):
    an "image batch" is one random frame per example, shaped (B, 1, H, W, C)
    so both modes share the video model signature."""
    if not is_image_batch:
        return videos
    rng = rng or np.random.default_rng()
    b, f = videos.shape[:2]
    idx = rng.integers(0, f, size=b)
    frames = videos[np.arange(b), idx]
    return frames[:, None]
