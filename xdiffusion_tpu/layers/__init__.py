"""Shared neural building blocks (flax.linen, NHWC layout).

TPU-native counterparts of the reference layer library
(/root/reference/xdiffusion/layers/): feature maps are channels-last
(XLA's preferred TPU conv layout), attention routes through
`xdiffusion_tpu.ops`, and parameter layouts are chosen for MXU tiling.
"""
