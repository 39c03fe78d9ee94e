"""PixArt-alpha: text-conditioned diffusion transformer (adaLN-single).

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/pixart.py:123-480 ("PixArt-alpha: Fast Training of
Diffusion Transformer...", arXiv:2310.00426): patchify -> N blocks of
[self-attention, text cross-attention, MLP] where the six modulation
signals come from ONE shared timestep MLP (adaLN-single) plus per-block
learned offsets — a parameter-efficient variant of DiT's per-block adaLN.

Host/device split: prompt tokenization projections marked host_side run in
the process's preprocess_context, never inside the traced forward.
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
from xdiffusion_tpu.ops import dot_product_attention


class CrossAttention(nn.Module):
    """Token sequence attends to a conditioning sequence."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        # Mirrors the reference LastChannelCrossAttention (reference
        # layers/attention.py:191-228): bias-free q/k/v projections, a
        # biased output projection that PixArt zero-initializes so
        # cross-attention starts as the identity (reference
        # pixart.py:343-348).
        b, n, c = x.shape
        head_dim = c // self.num_heads
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="q")(x)
        kv = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="kv")(y)
        k, v = jnp.split(kv, 2, axis=-1)
        to_heads = lambda t, l: t.reshape(b, l, self.num_heads, head_dim).transpose(
            0, 2, 1, 3
        )
        out = dot_product_attention(
            to_heads(q, n), to_heads(k, y.shape[1]), to_heads(v, y.shape[1])
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="proj"
        )(out)


class PixArtBlock(nn.Module):
    """Self-attn + cross-attn + MLP with adaLN-single modulation
    (reference: pixart.py:24-120)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    norm_cls: str = "layer"  # "layer" | "dyt" (DynamicTanh, norm-free)
    dtype: jnp.dtype = jnp.float32

    def _norm(self, name: str):
        if self.norm_cls == "dyt":
            from xdiffusion_tpu.layers.norm import DynamicTanhNorm

            return DynamicTanhNorm(dim=self.hidden_size, name=name)
        return nn.LayerNorm(use_bias=False, use_scale=False, name=name)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        y: jax.Array,
        shared_mod: jax.Array,  # (B, 6, hidden) from the shared t-block
        deterministic: bool = True,
    ) -> jax.Array:
        # Per-block learned offsets added to the shared modulation table.
        block_table = self.param(
            "scale_shift_table",
            lambda key: jax.random.normal(key, (6, self.hidden_size))
            / self.hidden_size**0.5,
        )
        mod = shared_mod + block_table[None]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            mod[:, i] for i in range(6)
        )

        def drop_path(h, rng_name):
            if self.drop_path <= 0.0 or deterministic:
                return h
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (h.shape[0], 1, 1)
            )
            return h * mask / keep

        norm1 = self._norm("norm1")(x)
        h = norm1 * (1.0 + scale_msa[:, None]) + shift_msa[:, None]
        h = MultiHeadSelfAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(h, deterministic=deterministic)
        x = x + drop_path(gate_msa[:, None] * h, "dp1")

        if y is not None:  # class-conditional configs set context_key: null
            x = x + CrossAttention(
                num_heads=self.num_heads, dtype=self.dtype, name="cross_attn"
            )(x, y)

        norm2 = self._norm("norm2")(x)
        h = norm2 * (1.0 + scale_mlp[:, None]) + shift_mlp[:, None]
        h = nn.Dense(
            int(self.hidden_size * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1"
        )(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + drop_path(gate_mlp[:, None] * h, "dp2")


class PixArtAlpha(nn.Module):
    """Instantiated with the score_network params block as a DotConfig."""

    config: Any
    # Subclasses (the DyT variant) flip this; `norm_cls:` in the config
    # params block always wins.
    _default_norm_cls = "layer"

    def setup(self):
        cfg = self.config
        self._patch_size = int(cfg.patch_size)
        self._hidden = int(cfg.hidden_size)
        self._is_learned_sigma = bool(cfg.is_learned_sigma)
        self._out_channels = (
            cfg.input_channels * 2 if self._is_learned_sigma else cfg.output_channels
        )
        s = cfg.input_spatial_size
        self._spatial = [s[0], s[1]] if isinstance(s, list) else [s, s]
        self._context_key = cfg.get("context_key", "context_embeddings")

        # Projections: host-side (prompt tokenizers) never enter the module
        # tree; traced ones do.
        projections = {}
        host_keys = []  # linen freezes lists on setattr; build locally
        for name in cfg.conditioning.signals:
            proj = instantiate_from_config(
                cfg.conditioning.projections[name].to_dict()
            )
            if getattr(proj, "host_side", False):
                host_keys.append(name)
            else:
                projections[name] = proj
        self._projections = projections
        self._host_projection_keys = tuple(host_keys)

        head_cfg = cfg.conditioning.context_transformer_head
        head_list = head_cfg if isinstance(head_cfg, list) else [head_cfg.to_dict()]
        heads = []
        for h in head_list:
            obj = instantiate_from_config(h)
            # Skip heads that run a host-side projection (already resolved
            # in preprocess_context).
            if (
                isinstance(obj, RunProjection)
                and obj.projection_key in host_keys
            ):
                continue
            heads.append(obj)
        self._context_heads = heads

        self._patch_embed = PatchEmbed(
            patch_size=self._patch_size, embed_dim=self._hidden, name="patch_embed"
        )
        grid = [self._spatial[0] // self._patch_size,
                self._spatial[1] // self._patch_size]
        # Reference PixArt passes base_size = input_size // patch_size
        # (== grid) and the config's lewei_scale (reference
        # score_networks/pixart.py:325-332).
        self._pos_embed = sincos_position_embedding_2d(
            self._hidden,
            grid[0],
            grid[1],
            base_size=grid[0],
            lewei_scale=float(cfg.get("lewei_scale", 1.0)),
        )
        # adaLN-single: one shared MLP emits the 6 modulation signals.
        self._t_block = nn.Dense(6 * self._hidden, name="t_block")

        drop_path = float(cfg.get("drop_path", 0.0))
        norm_cls = cfg.get("norm_cls", self._default_norm_cls)
        self._blocks = [
            PixArtBlock(
                hidden_size=self._hidden,
                num_heads=int(cfg.num_heads),
                mlp_ratio=float(cfg.mlp_ratio),
                drop_path=drop_path,
                norm_cls=norm_cls,
            )
            for _ in range(int(cfg.depth))
        ]
        # Final-layer adaLN-single offsets: shift/scale = table + t_emb
        # (reference PixArtAlphaFinalLayer, pixart.py:97-120).
        self._final_table = self.param(
            "final_scale_shift_table",
            lambda key: jax.random.normal(key, (2, self._hidden))
            / self._hidden**0.5,
        )
        if norm_cls == "dyt":
            from xdiffusion_tpu.layers.norm import DynamicTanhNorm

            self._final_norm = DynamicTanhNorm(
                dim=self._hidden, name="final_norm"
            )
        else:
            self._final_norm = nn.LayerNorm(
                use_bias=False, use_scale=False, name="final_norm"
            )
        self._final_proj = nn.Dense(
            self._patch_size * self._patch_size * self._out_channels,
            kernel_init=nn.initializers.zeros,
            name="final_proj",
        )

    def _unpatchify(self, x: jax.Array) -> jax.Array:
        b, n, _ = x.shape
        p = self._patch_size
        gh, gw = self._spatial[0] // p, self._spatial[1] // p
        c = self._out_channels
        x = x.reshape(b, gh, gw, p, p, c)
        return jnp.einsum("bhwpqc->bhpwqc", x).reshape(b, gh * p, gw * p, c)

    @nn.nowrap
    def _pipelined_blocks(self, tokens, y, shared_mod, pipe,
                          deterministic=True):
        """GPipe path (parallel/pipeline.py): homogeneous PixArt blocks
        stacked and staged over the 'pipeline' mesh axis; drop-path rng
        threads per (microbatch, block) when training."""
        from xdiffusion_tpu.parallel.pipeline import run_pipelined_stack

        tmpl = self._blocks[0].clone(parent=None)
        use_rng = (not deterministic) and tmpl.drop_path > 0.0
        rng = self.make_rng("dropout") if use_rng else None

        def tmpl_apply(p, a, cc, r):
            yy, sm = cc
            if r is None:
                return tmpl.apply(
                    {"params": p}, a, yy, sm, deterministic=deterministic
                )
            return tmpl.apply(
                {"params": p}, a, yy, sm, deterministic=False,
                rngs={"dropout": r},
            )

        params_list = [
            self.variables["params"][f"_blocks_{i}"]
            for i in range(len(self._blocks))
        ]
        return run_pipelined_stack(
            tmpl_apply, params_list, tokens, (y, shared_mod), pipe, rng=rng
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        context = dict(context)
        for head in self._context_heads:
            if (
                isinstance(head, (RunProjection, nn.Module))
                or hasattr(head, "projection_key")
                or hasattr(head, "source_context_keys")
            ):
                if hasattr(head, "source_context_keys") and not isinstance(
                    head, nn.Module
                ):
                    context = head(context)
                else:
                    context = head(context, self._projections)
            else:
                context = head(context)

        t_emb = context["timestep_embedding"]  # (B, hidden)
        shared_mod = self._t_block(nn.silu(t_emb)).reshape(
            t_emb.shape[0], 6, self._hidden
        )
        # (B, L, hidden) cross-attention context, or None when the config
        # disables the text path (context_key: null).
        y = context[self._context_key] if self._context_key else None

        tokens = self._patch_embed(x) + self._pos_embed[None]
        pipe = None
        if not self.is_initializing():
            from xdiffusion_tpu.parallel.pipeline import get_pipeline_context

            pipe = get_pipeline_context()
        if pipe is not None:
            tokens = self._pipelined_blocks(
                tokens, y, shared_mod, pipe, deterministic=deterministic
            )
        else:
            for block in self._blocks:
                tokens = block(
                    tokens, y, shared_mod, deterministic=deterministic
                )

        # Final layer: shift = table[0] + t_emb, scale = table[1] + t_emb
        # applied to the (affine-free) final norm (reference
        # pixart.py:116-120 — note t here is the raw timestep embedding,
        # NOT the shared t_block output).
        fmod = self._final_table[None] + t_emb[:, None]  # (B, 2, hidden)
        shift, scale = fmod[:, 0], fmod[:, 1]
        tokens = (
            self._final_norm(tokens) * (1.0 + scale[:, None]) + shift[:, None]
        )
        tokens = self._final_proj(tokens)
        out = self._unpatchify(tokens).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
