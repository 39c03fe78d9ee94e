"""SD3.5 MMDiT-X: SD3 with dual image-stream attention in early blocks.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/sd35.py:12-176 + layers/sd35.py (Stability's MMDiT-X): the
first `dual_attention_layers` blocks add a second, independent
self-attention over the modulated image stream whose output is summed into
the residual alongside the joint attention (per the SD3.5 reference
implementation).
"""

from __future__ import annotations

from xdiffusion_tpu.score_networks.sd3 import (
    MMDiTBlock,
    SD3Transformer2DModel as _SD3,
)


class SD35Transformer2DModel(_SD3):
    """SD3 with MMDiT-X (dual-attention) blocks in the first
    dual_attention_layers. The dual path is implemented inside
    MMDiTBlock (sd3.py) so its residual lands before the MLP, matching
    the reference ordering (reference layers/sd35.py:115-165)."""

    def _make_block(self, i: int, n_layers: int):
        # Config lists the block indices that get the dual path
        # (reference score_networks/sd35.py:74); an int N is accepted as
        # shorthand for the first N blocks.
        dual = self.config.get("dual_attention_layers", ())
        in_dual = i < int(dual) if isinstance(dual, int) else i in tuple(dual)
        return MMDiTBlock(
            dim=self._dim,
            num_heads=self._num_heads,
            context_pre_only=(i == n_layers - 1),
            dual_attention=in_dual,
            qk_norm=str(self.config.get("qk_norm", "")) == "rms_norm",
            name=f"block_{i}",
        )
