"""Reference (PyTorch) checkpoint importers.

Maps reference `state_dict`s onto our flax parameter trees so the same
weights can run in both stacks — the network-level golden-parity
mechanism (reference load path: /root/reference/xdiffusion/diffusion/
ddpm.py:795-814, training/image/train.py:144-148).
"""

from xdiffusion_tpu.importers.torch_state_dict import (
    import_dit_params,
    import_score_network_params,
    import_unet_params,
    load_torch_checkpoint,
)

__all__ = [
    "load_torch_checkpoint",
    "import_unet_params",
    "import_dit_params",
    "import_score_network_params",
]
