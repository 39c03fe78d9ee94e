"""Reference CLI path (reference training/audio/urbansound8k/
train_autoencoder.py:206-213): train the KL VAE that compresses
UrbanSound8k log-mel spectrograms (1x128x256 -> latent). Delegates to the
generic VAE-GAN trainer on the audio/urbansound8k dataset."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "..")
)

from training.image.autoencoder import main

if __name__ == "__main__":
    if "--dataset_name" not in sys.argv:
        sys.argv.extend(["--dataset_name", "audio/urbansound8k"])
    main()
