"""Sequence-model residual wrappers (reference:
xdiffusion/layers/sequence.py). The implementation lives with the S4D
kernel; re-exported here so reference configs targeting
xdiffusion.layers.sequence.* resolve."""

from xdiffusion_tpu.layers.s4d import S4D, SequenceResidualBlock

__all__ = ["S4D", "SequenceResidualBlock"]
