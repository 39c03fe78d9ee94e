"""Audio pipeline tests: mel transforms, Griffin-Lim inversion, CLAP
fallback embeddings, UrbanSound8k + CIFAR10 dataset fallbacks."""

import jax
import jax.numpy as jnp
import numpy as np

from xdiffusion_tpu.datasets import load_dataset
from xdiffusion_tpu.layers.audio import (
    logmel_to_mel,
    mel_filterbank,
    mel_to_logmel,
    mel_to_wav,
    wav_to_mel,
)
from xdiffusion_tpu.layers.clap import FrozenCLAPTextEmbedder


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(22050, 1024, 80)
    assert fb.shape == (80, 513)
    # Every mel bin collects some energy.
    assert (fb.sum(axis=1) > 0).all()


def test_wav_mel_roundtrip_preserves_pitch():
    sr = 22050
    t = np.arange(sr) / sr
    wav = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mel = wav_to_mel(wav, sample_rate=sr)
    assert mel.shape[1] == 80
    # Energy concentrates near the 440 Hz mel bin.
    peak_bin = int(jnp.argmax(mel.mean(axis=0)))
    fb = mel_filterbank(sr, 1024, 80)
    freqs = np.linspace(0, sr / 2, fb.shape[1])
    center = freqs[np.argmax(fb[peak_bin])]
    assert 300 < center < 650

    # log-mel normalizer roundtrip.
    lm = mel_to_logmel(mel)
    back = logmel_to_mel(lm)
    np.testing.assert_allclose(
        np.asarray(back), np.clip(np.asarray(mel), 1e-5, None), rtol=1e-3
    )

    # Griffin-Lim reconstruction keeps the dominant frequency.
    rec = np.asarray(mel_to_wav(mel, sample_rate=sr, n_iter=8))
    spec_orig = np.abs(np.fft.rfft(wav[: len(rec)]))
    spec_rec = np.abs(np.fft.rfft(rec))
    assert abs(np.argmax(spec_rec) - np.argmax(spec_orig)) < 10


def test_clap_fallback_embeddings():
    emb = FrozenCLAPTextEmbedder(embedding_dim=64)
    ctx = emb({"text_prompts": ["dog bark", "siren", "dog bark"]})
    e = np.asarray(ctx["clap_embeddings"])
    assert e.shape == (3, 64)
    np.testing.assert_allclose(e[0], e[2])  # deterministic
    assert not np.allclose(e[0], e[1])  # distinct prompts differ
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-5)


def test_urbansound8k_dataset_fallback():
    ds, to_prompts = load_dataset("audio/urbansound8k", split="val")
    x, label = ds[0]
    assert x.shape == (32, 32, 1) and 0 <= label < 10
    prompts = to_prompts(ds.labels[:4])
    assert len(prompts) == 4 and all(isinstance(p, str) for p in prompts)


def test_cifar10_dataset_fallback():
    ds, to_prompts = load_dataset("image/cifar10", split="val")
    x, label = ds[0]
    assert x.shape == (32, 32, 3)
    assert len(to_prompts(ds.labels[:2])) == 2
