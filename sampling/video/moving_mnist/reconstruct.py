"""Reference CLI path (reference sampling/video/moving_mnist/reconstruct.py):
delegates to the generic video CLI, same flags."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "..")
)

from sampling.video.reconstruct import main

if __name__ == "__main__":
    main()
