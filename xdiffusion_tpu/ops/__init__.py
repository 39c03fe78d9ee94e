"""Hot-path ops: Pallas TPU kernels with pure-XLA fallbacks.

Every op in this package has two implementations selected at trace time:
a Pallas kernel tuned for TPU tiling (MXU/VPU-aligned shapes), and a
jnp/XLA fallback used for small shapes, interpret mode, and non-TPU
backends. Callers import the dispatcher, never a specific backend.
"""

from xdiffusion_tpu.ops.attention import (  # noqa: F401
    attention_bshd,
    attention_qkv,
    dot_product_attention,
)
from xdiffusion_tpu.ops.group_norm import group_norm_silu  # noqa: F401
from xdiffusion_tpu.ops.norm import (  # noqa: F401
    group_norm,
    group_norm_scale_shift,
)
from xdiffusion_tpu.ops.ring_attention import (  # noqa: F401
    ring_attention,
    sequence_parallel_attention,
)
