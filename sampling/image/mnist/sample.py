"""Reference CLI path (reference sampling/image/mnist/sample.py): delegates
to the generic image sampler, same flags."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "..")
)

from sampling.image.sample import main

if __name__ == "__main__":
    main()
