"""Reference CLI path (reference training/image/mnist/train_lora.py:1-508):
LoRA fine-tuning on MNIST. Delegates to the image trainer with
--use_lora_training forced on; --load_model_weights_from_checkpoint
supplies the frozen base."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "..")
)

from training.image.train import main

if __name__ == "__main__":
    if "--use_lora_training" not in sys.argv:
        sys.argv.append("--use_lora_training")
    main()
