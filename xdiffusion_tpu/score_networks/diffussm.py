"""DiffuSSM: attention-free diffusion with bidirectional state spaces.

Faithful counterpart of /root/reference/xdiffusion/score_networks/
diffussm.py:16-128 ("Diffusion Models Without Attention",
arXiv:2311.18257): tokens (one per pixel) run through N blocks of
[adaLN modulation -> hourglass (sequence downscale MLP upscale) ->
bidirectional S4D -> gated fusion]. No attention anywhere — compute is
dense matmuls + FFT convolutions, both TPU-friendly.

Fidelity notes (matching reference quirks):
- the block's residual adds the gated fusion to the MODULATED input
  `h`, not the raw input `x` (diffussm.py:79);
- the forward ignores class labels entirely even when the config says
  `is_class_conditional: True` (diffussm.py:101-128 never reads
  context["classes"]);
- the timestep features are the GLIDE-style cos-first embedding
  (layers/utils.py:90 via diffussm.py:109).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.layers.embedding import glide_timestep_embedding
from xdiffusion_tpu.layers.flux import MLPEmbedder
from xdiffusion_tpu.layers.s4d import SequenceResidualBlock


class DiffusionSSMBlock(nn.Module):
    """One DiffuSSM block (reference diffussm.py:16-79)."""

    d_model: int
    seq_len: int
    hourglass_ratio: int = 2
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        l = self.seq_len
        j = l // self.hourglass_ratio
        d = self.d_model

        y = MLPEmbedder(hidden_dim=d, name="condition_embedder")(cond)
        # Modulation(dim, double=False): shift/scale/gate chunks of
        # lin(silu(y)) (reference layers/flux.py:135-150).
        mod = nn.Dense(3 * d, name="modulation")(nn.silu(y))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)

        h = nn.LayerNorm(
            use_bias=False, use_scale=False, name="input_norm"
        )(x)
        h = (1.0 + scale[:, None]) * h + shift[:, None]

        def resample_seq(t, new_len, name):
            # (B, L, d) -> (B, new_len, d): the reference's k=1 Conv1d
            # over the SEQUENCE axis (channels = positions), features
            # untouched.
            t = t.transpose(0, 2, 1)  # (B, d, L)
            t = nn.Dense(new_len, name=name)(t)  # (B, d, new_len)
            return t.transpose(0, 2, 1)

        # Hourglass: downscale the sequence axis, MLP, upscale
        # (reference diffussm.py:32-39), then the bidirectional SSM.
        hg = resample_seq(h, j, "hourglass_down")
        hg = MLPEmbedder(hidden_dim=d, name="hourglass_mlp")(hg)
        hg = resample_seq(hg, l, "hourglass_up")
        h_ssm, _ = SequenceResidualBlock(
            d_input=d, bidirectional=self.bidirectional, name="ssm"
        )(hg, deterministic=deterministic)

        # Gated fusion of the modulated input and the SSM branch
        # (reference diffussm.py:72-76).
        left = MLPEmbedder(hidden_dim=d, name="mlp_left")(
            resample_seq(h, j, "down_left")
        )
        right = MLPEmbedder(hidden_dim=d, name="mlp_right")(
            resample_seq(h_ssm, j, "down_right")
        )
        fused = MLPEmbedder(hidden_dim=d, name="mlp_final")(left * right)
        fused = resample_seq(fused, l, "upscale_final")
        # NOTE: the residual base is the modulated `h`, not `x`
        # (reference diffussm.py:79).
        return h + gate[:, None] * fused


class DiffusionSSM(nn.Module):
    """DiffuSSM score network (reference diffussm.py:82-128)."""

    config: Any

    def setup(self):
        cfg = self.config
        self._d_model = int(cfg.d_model)
        self._seq_len = int(cfg.input_spatial_size) ** 2
        self._is_learned_sigma = bool(cfg.get("is_learned_sigma", False))
        out_mult = 2 if self._is_learned_sigma else 1
        self._d_out = int(cfg.get("output_channels", cfg.d_input)) * out_mult

        self._input_proj = nn.Dense(self._d_model, name="input_proj")
        self._output_proj = nn.Dense(self._d_out, name="output_proj")
        bidirectional = True
        if "block_config" in cfg and "params" in cfg.block_config:
            bidirectional = bool(
                cfg.block_config.params.get("bidirectional", True)
            )
        self._blocks = [
            DiffusionSSMBlock(
                d_model=self._d_model,
                seq_len=self._seq_len,
                hourglass_ratio=int(cfg.get("M", 2)),
                bidirectional=bidirectional,
                name=f"layer_{i}",
            )
            for i in range(int(cfg.n_layers))
        ]

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        b, h, w, c = x.shape
        # Reference quirk: classes are never consumed, even for
        # is_class_conditional configs (diffussm.py:101-128).
        cond = glide_timestep_embedding(
            context["timestep"].astype(jnp.float32), 256
        )

        tokens = self._input_proj(x.reshape(b, h * w, c))
        for block in self._blocks:
            tokens = block(tokens, cond, deterministic=deterministic)
        out = self._output_proj(tokens).reshape(b, h, w, self._d_out)
        out = out.astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
