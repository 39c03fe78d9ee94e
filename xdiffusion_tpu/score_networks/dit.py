"""DiT: Diffusion Transformer score network (adaLN-Zero).

Config-compatible counterpart of the reference DiT
(/root/reference/xdiffusion/score_networks/dit.py:77-229, "Scalable
Diffusion Models with Transformers", arXiv:2212.09748): patchify ->
transformer blocks modulated by adaLN-Zero conditioning -> linear
unpatchify head.

TPU notes: token count at 32x32/patch-8 is 16, so all attention runs on
the fused XLA path; hidden matmuls (384 x 1536 MLPs) land on the MXU. The
conditioning MLP emits all 6 modulation signals in one matmul per block.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.config import DotConfig, instantiate_from_config
from xdiffusion_tpu.layers.attention import MultiHeadSelfAttention
from xdiffusion_tpu.layers.embedding import (
    PatchEmbed,
    RunProjection,
    sincos_position_embedding_2d,
)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    """Transformer block with adaLN-Zero conditioning
    (reference: dit.py:20-52)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Mixture-of-Experts MLP branch (beyond-reference; layers/moe.py).
    # num_experts > 1 replaces the dense MLP with a Switch/GShard-routed
    # expert bank whose stacked kernels shard over an 'expert' mesh axis.
    num_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(
        self, x: jax.Array, c: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        # One matmul for all six modulation signals; zero-init so every
        # block starts as identity (adaLN-Zero).
        mod = nn.Dense(
            6 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="adaLN_modulation",
        )(nn.silu(c))
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = jnp.split(
            mod, 6, axis=-1
        )

        norm1 = nn.LayerNorm(use_bias=False, use_scale=False, name="norm1")(x)
        attn = MultiHeadSelfAttention(
            num_heads=self.num_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            name="attn",
        )(modulate(norm1, shift_msa, scale_msa), deterministic=deterministic)
        x = x + gate_msa[:, None, :] * attn

        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x)
        h = modulate(norm2, shift_mlp, scale_mlp)
        mlp_dim = int(self.hidden_size * self.mlp_ratio)
        if self.num_experts > 1:
            from xdiffusion_tpu.layers.moe import MoEMlp

            h = MoEMlp(
                hidden_size=self.hidden_size,
                mlp_dim=mlp_dim,
                num_experts=self.num_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name="moe_mlp",
            )(h, deterministic=deterministic)
        else:
            h = nn.Dense(mlp_dim, dtype=self.dtype, name="mlp_fc1")(h)
            h = nn.gelu(h, approximate=True)
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + gate_mlp[:, None, :] * h


class FinalLayer(nn.Module):
    """adaLN + zero-init linear head (reference: dit.py:55-74)."""

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        mod = nn.Dense(
            2 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="adaLN_modulation",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, name="norm")(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(x)


class DiT(nn.Module):
    """Instantiated with the score_network params block as a DotConfig."""

    config: Any

    def setup(self):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.get("dtype", "float32") == "bfloat16" else jnp.float32
        self._dtype = dt
        self._patch_size = int(cfg.patch_size)
        self._hidden_size = int(cfg.hidden_size)
        self._is_learned_sigma = bool(cfg.is_learned_sigma)
        self._out_channels = (
            cfg.input_channels * 2 if self._is_learned_sigma else cfg.output_channels
        )
        s = cfg.input_spatial_size
        self._spatial = [s[0], s[1]] if isinstance(s, list) else [s, s]

        projections = {}
        for name in cfg.conditioning.signals:
            projections[name] = instantiate_from_config(
                cfg.conditioning.projections[name].to_dict()
            )
        self._projections = projections
        head_cfg = cfg.conditioning.context_transformer_head
        head_list = head_cfg if isinstance(head_cfg, list) else [head_cfg.to_dict()]
        self._context_heads = [instantiate_from_config(h) for h in head_list]

        self._patch_embed = PatchEmbed(
            patch_size=self._patch_size,
            embed_dim=self._hidden_size,
            dtype=dt,
            name="patch_embed",
        )
        grid = [self._spatial[0] // self._patch_size,
                self._spatial[1] // self._patch_size]
        # Reference DiT calls get_2d_sincos_pos_embed with its default
        # base_size=16 (reference score_networks/dit.py:159-162), which
        # rescales positions by 16/grid.
        self._pos_embed = sincos_position_embedding_2d(
            self._hidden_size, grid[0], grid[1], base_size=16
        )
        dropout = float(cfg.dropout) if "dropout" in cfg else 0.0
        self._dropout = dropout
        self._moe_kwargs = dict(
            num_experts=int(cfg.get("num_experts", 0) or 0),
            moe_top_k=int(cfg.get("moe_top_k", 1) or 1),
            moe_capacity_factor=float(cfg.get("moe_capacity_factor", 1.25)),
        )
        self._blocks = [
            DiTBlock(
                hidden_size=self._hidden_size,
                num_heads=int(cfg.num_heads),
                mlp_ratio=float(cfg.mlp_ratio),
                dropout=dropout,
                dtype=dt,
                **self._moe_kwargs,
            )
            for _ in range(int(cfg.depth))
        ]
        self._final = FinalLayer(
            hidden_size=self._hidden_size,
            patch_size=self._patch_size,
            out_channels=self._out_channels,
        )

    @nn.nowrap
    def _pipelined_blocks(self, tokens, c, pipe, deterministic=True):
        """Run the homogeneous block stack through the GPipe engine
        (parallel/pipeline.py): per-block params stacked along a leading
        axis sharded over the 'pipeline' mesh axis, microbatches
        circulated stage-to-stage with ppermute. Block-internal dropout
        is preserved: when training with dropout enabled, a 'dropout' rng
        is folded per (microbatch, block) inside the pipelined scan, so
        masks are schedule-independent deterministic functions of the key.
        """
        from xdiffusion_tpu.parallel.pipeline import (
            gpipe_blocks,
            stack_block_params,
        )

        if self._moe_kwargs.get("num_experts", 0) > 1:
            # The pipelined scan applies a detached block template without
            # the 'intermediates' collection, so MoEMlp's sown aux loss
            # would be silently discarded and the router would train
            # without its load-balance term (expert-collapse risk). Fail
            # loudly rather than train a subtly-broken MoE.
            raise ValueError(
                "pipeline parallelism does not support MoE blocks: the "
                "load-balance aux loss cannot thread through the pipelined "
                "scan. Use an 'expert' mesh axis (expert parallelism) "
                "instead of 'pipeline' for MoE configs."
            )

        mesh, axis, n_mb = pipe
        cfg = self.config
        use_dropout = (not deterministic) and self._dropout > 0.0
        tmpl = DiTBlock(
            hidden_size=self._hidden_size,
            num_heads=int(cfg.num_heads),
            mlp_ratio=float(cfg.mlp_ratio),
            dropout=self._dropout if use_dropout else 0.0,
            dtype=self._dtype,
            parent=None,  # detached template — applied with explicit params
            **self._moe_kwargs,
        )
        stacked = stack_block_params(
            [
                self.variables["params"][f"_blocks_{i}"]
                for i in range(len(self._blocks))
            ]
        )

        if use_dropout:
            rng = self.make_rng("dropout")

            def block_fn(p, a, cc, rng_block):
                return tmpl.apply(
                    {"params": p},
                    a,
                    cc,
                    deterministic=False,
                    rngs={"dropout": rng_block},
                )

        else:
            rng = None

            def block_fn(p, a, cc):
                return tmpl.apply({"params": p}, a, cc, deterministic=True)

        return gpipe_blocks(
            block_fn, stacked, tokens, c, mesh,
            axis=axis, num_microbatches=n_mb, rng=rng,
        )

    def _unpatchify(self, x: jax.Array) -> jax.Array:
        """(B, N, p*p*C) -> (B, H, W, C)."""
        b, n, _ = x.shape
        p = self._patch_size
        gh, gw = self._spatial[0] // p, self._spatial[1] // p
        c = self._out_channels
        x = x.reshape(b, gh, gw, p, p, c)
        x = jnp.einsum("bhwpqc->bhpwqc", x)
        return x.reshape(b, gh * p, gw * p, c)

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        context = dict(context)
        for head in self._context_heads:
            if isinstance(head, RunProjection):
                context = head(context, self._projections)
            elif hasattr(head, "source_context_keys"):  # combine op
                context = head(context)
            else:
                context = head(context)
        c = context["timestep_embedding"]

        tokens = self._patch_embed(x) + self._pos_embed[None, :, :]
        pipe = None
        if not self.is_initializing():
            from xdiffusion_tpu.parallel.pipeline import get_pipeline_context

            pipe = get_pipeline_context()
        if pipe is not None:
            tokens = self._pipelined_blocks(
                tokens, c, pipe, deterministic=deterministic
            )
        else:
            for block in self._blocks:
                tokens = block(tokens, c, deterministic=deterministic)
        tokens = self._final(tokens, c)
        out = self._unpatchify(tokens).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
