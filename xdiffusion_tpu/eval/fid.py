"""FID harness (Frechet distance over learned classifier features).

The reference ships no metric code (SURVEY §5: piq is a dependency but
never called), so this is green-field per the north star ("FID within 2%
... FID harness must be built"). For MNIST-scale data the standard
practice is a small LeNet-style classifier's penultimate features in
place of InceptionV3:

    fid = |mu_r - mu_g|^2 + Tr(C_r + C_g - 2 (C_r C_g)^{1/2})

The extractor trains in seconds on-device and is checkpointed so repeated
evaluations share the same feature space.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class FeatureClassifier(nn.Module):
    """LeNet-ish classifier; features() returns the penultimate layer."""

    num_classes: int = 10
    feature_dim: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, return_features: bool = False):
        h = nn.Conv(32, (3, 3), strides=(2, 2), name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(64, (3, 3), strides=(2, 2), name="conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(128, (3, 3), strides=(2, 2), name="conv3")(h)
        h = nn.relu(h)
        h = h.reshape(h.shape[0], -1)
        feats = nn.Dense(self.feature_dim, name="features")(h)
        if return_features:
            return feats
        return nn.Dense(self.num_classes, name="logits")(nn.relu(feats))


def train_feature_extractor(
    images: np.ndarray,
    labels: np.ndarray,
    steps: int = 500,
    batch_size: int = 256,
    seed: int = 0,
):
    """Quick supervised training of the feature extractor. images: (N, S,
    S, C) in [0,1]."""
    model = FeatureClassifier()
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1,) + images.shape[1:]))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    host = np.random.default_rng(seed)
    n = images.shape[0]
    loss = None
    for i in range(steps):
        idx = host.integers(0, n, size=min(batch_size, n))
        params, opt_state, loss = step(
            params,
            opt_state,
            jnp.asarray(images[idx], dtype=jnp.float32),
            jnp.asarray(labels[idx], dtype=jnp.int32),
        )
    return model, params, float(loss)


def extract_features(
    model, params, images: np.ndarray, batch_size: int = 512
) -> np.ndarray:
    feats = []
    apply = jax.jit(lambda p, x: model.apply(p, x, return_features=True))
    for start in range(0, images.shape[0], batch_size):
        x = jnp.asarray(
            images[start : start + batch_size], dtype=jnp.float32
        )
        feats.append(np.asarray(apply(params, x)))
    return np.concatenate(feats)


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    from scipy import linalg

    mu_a, mu_b = feats_a.mean(axis=0), feats_b.mean(axis=0)
    cov_a = np.cov(feats_a, rowvar=False)
    cov_b = np.cov(feats_b, rowvar=False)
    diff = mu_a - mu_b
    covmean, _ = linalg.sqrtm(cov_a @ cov_b, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov_a + cov_b - 2.0 * covmean))


def compute_fid(
    real_images: np.ndarray,
    generated_images: np.ndarray,
    labels: Optional[np.ndarray] = None,
    extractor: Optional[Tuple] = None,
    classifier_steps: int = 500,
) -> float:
    """FID between two [0,1] image sets; trains (or reuses) the extractor."""
    if extractor is None:
        assert labels is not None, "need labels to train the extractor"
        model, params, _ = train_feature_extractor(
            real_images, labels, steps=classifier_steps
        )
    else:
        model, params = extractor
    fa = extract_features(model, params, real_images)
    fb = extract_features(model, params, generated_images)
    # Standardize both sets by the REAL set's per-dimension statistics: the
    # LeNet features are unnormalized (unlike Inception pool3), so the raw
    # Frechet distance would be dominated by feature scale. After
    # standardization the real-vs-real floor is ~0.
    mu, sigma = fa.mean(axis=0), fa.std(axis=0) + 1e-6
    fa = (fa - mu) / sigma
    fb = (fb - mu) / sigma
    return frechet_distance(fa, fb)
