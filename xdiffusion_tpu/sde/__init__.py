"""SDE library (Score-SDE forward/reverse processes).

Counterpart of /root/reference/xdiffusion/sde/. Round 1 provides the base
protocol and the rectified-flow shell; VP/subVP SDEs arrive with the
score-SDE diffusion process.
"""

from xdiffusion_tpu.sde.base import SDE  # noqa: F401
from xdiffusion_tpu.sde.rectified_flow import RectifiedFlow  # noqa: F401
