"""Reference CLI path (reference training/image/moving_mnist/train_lora.py):
LoRA fine-tuning on image-view Moving-MNIST. Delegates to the image trainer with
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
    if "--dataset_name" not in sys.argv:
        sys.argv.extend(["--dataset_name", "image/moving_mnist"])
    main()
