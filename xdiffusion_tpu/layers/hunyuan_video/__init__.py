"""HunyuanVideo conditioning layers (reference:
xdiffusion/layers/hunyuan_video/)."""
