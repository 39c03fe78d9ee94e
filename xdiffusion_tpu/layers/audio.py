"""Audio <-> mel-spectrogram transforms (on-device, jnp).

Behavioral counterpart of /root/reference/xdiffusion/layers/audio.py:9-64
(which uses torchaudio MelSpectrogram/InverseMelScale/GriffinLim): STFT ->
mel projection for the forward path, iterative Griffin-Lim phase recovery
plus mel-filterbank pseudo-inverse for the inverse. The log-mel
normalizers are config-selected output transforms
(configs/audio/.../ddpm_32x32_v_continuous_clap.yaml:190-191 in the
reference).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache()
def mel_filterbank(
    sample_rate: int = 22050,
    n_fft: int = 1024,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular mel filterbank (HTK scale)."""
    f_max = f_max or sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_freqs), dtype=np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def _stft_mag(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """|STFT|: (T,) -> (frames, n_fft//2+1), hann window, centered."""
    window = jnp.hanning(n_fft).astype(jnp.float32)
    pad = n_fft // 2
    wav = jnp.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (wav.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = wav[idx] * window[None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec)


def wav_to_mel(
    wav: jax.Array,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
) -> jax.Array:
    """(T,) waveform -> (n_mels, frames) power mel-spectrogram."""
    mag = _stft_mag(jnp.asarray(wav, jnp.float32), n_fft, hop_length)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    return (mag**2) @ fb.T  # (frames, n_mels)


def mel_to_wav(
    mel: jax.Array,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    n_iter: int = 32,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Griffin-Lim inversion: (frames, n_mels) -> (T,) waveform."""
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    # Pseudo-inverse mel -> linear power spectrum.
    pinv = jnp.asarray(np.linalg.pinv(np.asarray(fb)).astype(np.float32))
    power = jnp.clip(mel @ pinv.T, 0.0, None)
    mag = jnp.sqrt(power)  # (frames, n_freqs)

    window = jnp.hanning(n_fft).astype(jnp.float32)
    n_frames = mag.shape[0]
    length = n_frames * hop_length

    def istft(spec):
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]
        out = jnp.zeros((length + n_fft,))
        norm = jnp.zeros((length + n_fft,))
        idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
        out = out.at[idx.reshape(-1)].add(frames.reshape(-1))
        norm = norm.at[idx.reshape(-1)].add((window**2)[None, :].repeat(
            n_frames, axis=0
        ).reshape(-1))
        return out / jnp.clip(norm, 1e-8, None)

    def stft_c(wav):
        pad = n_fft // 2
        w = jnp.pad(wav[: length], (0, max(0, length - wav.shape[0])))
        nfr = n_frames
        idx = jnp.arange(nfr)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
        w = jnp.pad(w, (0, n_fft))
        frames = w[idx] * window[None, :]
        return jnp.fft.rfft(frames, axis=-1)

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    angles = jnp.exp(
        2j * jnp.pi * jax.random.uniform(rng, mag.shape)
    )

    def body(_, angles):
        wav = istft(mag * angles)
        spec = stft_c(wav)
        return spec / jnp.clip(jnp.abs(spec), 1e-8, None)

    angles = jax.lax.fori_loop(0, n_iter, body, angles)
    wav = istft(mag * angles)
    return wav[:length]


def mel_to_logmel(mel: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Config-selected normalizer: power mel -> clipped log scale [0,1]ish."""
    return (jnp.log(jnp.clip(mel, eps, None)) - jnp.log(eps)) / (-2.0 * jnp.log(eps))


def logmel_to_mel(logmel: jax.Array, eps: float = 1e-5) -> jax.Array:
    return jnp.exp(logmel * (-2.0 * jnp.log(eps)) + jnp.log(eps))
