"""CLI: build a mel-spectrogram dataset from audio clips
(reference tool surface: tools/create_mel_spec.py:23).

Reads .wav files from --audio_dir (class per subdirectory) when present;
otherwise synthesizes class-colored clips offline. Writes
{data_root}/urbansound8k/melspec_{split}.npz consumed by the
audio/urbansound8k dataset.
"""

import argparse
import os
import sys
import wave

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def read_wav(path: str) -> np.ndarray:
    with wave.open(path, "rb") as w:
        data = w.readframes(w.getnframes())
        arr = np.frombuffer(data, dtype=np.int16).astype(np.float32) / 32768.0
        if w.getnchannels() > 1:
            arr = arr.reshape(-1, w.getnchannels()).mean(axis=1)
        return arr


def main():
    p = argparse.ArgumentParser(description="Create mel-spec dataset.")
    p.add_argument("--audio_dir", type=str, default="")
    p.add_argument("--num_clips", type=int, default=2048)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from xdiffusion_tpu.datasets.mnist import data_root
    from xdiffusion_tpu.datasets.urbansound8k import (
        CLASS_NAMES,
        synthesize_clips,
    )
    from xdiffusion_tpu.layers.audio import mel_to_logmel, wav_to_mel

    clips, labels = [], []
    if args.audio_dir and os.path.isdir(args.audio_dir):
        for li, name in enumerate(CLASS_NAMES):
            cdir = os.path.join(args.audio_dir, name.replace(" ", "_"))
            if not os.path.isdir(cdir):
                continue
            for f in sorted(os.listdir(cdir)):
                if f.endswith(".wav"):
                    clips.append(read_wav(os.path.join(cdir, f)))
                    labels.append(li)
    if not clips:
        arr, labels = synthesize_clips(args.num_clips, seed=args.seed)
        clips = list(arr)

    mels = []
    for clip in clips:
        m = np.asarray(mel_to_logmel(wav_to_mel(clip, n_mels=args.image_size)))
        frames = m.shape[0]
        if frames >= args.image_size:
            m = m[: args.image_size]
        else:
            m = np.pad(m, ((0, args.image_size - frames), (0, 0)))
        mels.append(m)
    mels = np.stack(mels)[..., None].astype(np.float32)
    labels = np.asarray(labels, dtype=np.int32)

    out_dir = os.path.join(data_root(), "urbansound8k")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"melspec_{args.split}.npz")
    np.savez_compressed(out, mels=mels, labels=labels)
    print(f"wrote {out}: mels {mels.shape}")


if __name__ == "__main__":
    main()
