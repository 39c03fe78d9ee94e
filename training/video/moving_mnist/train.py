"""Reference CLI path (reference training/video/moving_mnist/train.py):
delegates to the generic video trainer with the moving-mnist default."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "..")
)

from training.video.train import main

if __name__ == "__main__":
    main()
