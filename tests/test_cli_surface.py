"""The reference repo's CLI entry-point paths all exist and parse --help
(SURVEY appendix: entry-point command surface)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CLI_PATHS = [
    "training/image/train.py",
    "training/video/train.py",
    "training/video/autoencoder.py",
    "training/video/moving_mnist/train.py",
    "training/audio/urbansound8k/train.py",
    "training/audio/urbansound8k/train_autoencoder.py",
    "training/image/mnist/distill.py",
    "training/image/mnist/distill_consistency.py",
    "training/image/mnist/train_lora.py",
    "training/image/moving_mnist/train_lora.py",
    "sampling/image/sample.py",
    "sampling/image/mnist/sample.py",
    "sampling/image/moving_mnist/sample.py",
    "sampling/video/sample.py",
    "sampling/video/extend.py",
    "sampling/video/reconstruct.py",
    "sampling/video/moving_mnist/sample.py",
    "sampling/video/moving_mnist/extend.py",
    "sampling/video/moving_mnist/reconstruct.py",
    "tools/create_moving_mnist.py",
    "tools/create_mnist_embeddings_gemma_2.py",
    "tools/create_mel_spec.py",
    "tools/measure_fid.py",
]


@pytest.mark.parametrize("rel", REFERENCE_CLI_PATHS, ids=str)
def test_cli_exists_and_parses_help(rel):
    path = os.path.join(REPO, rel)
    assert os.path.exists(path), rel
    proc = subprocess.run(
        [sys.executable, path, "--help"],
        capture_output=True,
        timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr.decode()[-500:]
