"""SD3 MMDiT: dual-stream multimodal diffusion transformer.

Config-compatible counterpart of /root/reference/xdiffusion/
score_networks/sd3.py:11-170 + layers/sd3.py ("Scaling Rectified Flow
Transformers...", arXiv:2403.03206): image patches and text embeddings
run as two streams with separate adaLN-Zero modulation and weights, joined
at every block through ONE attention over the concatenated token sequence
(joint attention). Conditioning = timestep embedding + pooled text
projection; the final block drops the text stream.

TPU note: joint attention concatenates streams on the sequence axis so the
MXU sees a single large attention instead of two small ones per block.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from xdiffusion_tpu.config import DotConfig
from xdiffusion_tpu.layers.embedding import (
    PatchEmbed,
    glide_timestep_embedding,
    sincos_position_embedding_2d,
)
from xdiffusion_tpu.ops import dot_product_attention


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None]) + shift[:, None]


class TimestepTextEmbed(nn.Module):
    """temb = MLP(sinusoidal(t)) + MLP(pooled_text)."""

    embedding_dim: int
    pooled_projection_dim: int

    @nn.compact
    def __call__(self, timestep: jax.Array, pooled: jax.Array) -> jax.Array:
        # Reference CombinedTimestepTextProjEmbeddings uses the diffusers
        # Timesteps features: cos-first, `half` freq divisor (reference
        # embedding.py:766-779 -> layers/utils.py:90).
        t = glide_timestep_embedding(timestep.astype(jnp.float32), 256)
        t = nn.Dense(self.embedding_dim, name="t_fc1")(t)
        t = nn.Dense(self.embedding_dim, name="t_fc2")(nn.silu(t))
        p = nn.Dense(self.embedding_dim, name="p_fc1")(pooled)
        p = nn.Dense(self.embedding_dim, name="p_fc2")(nn.silu(p))
        return t + p


class MMDiTBlock(nn.Module):
    """Dual-stream block with joint attention (reference: layers/sd3.py:8).

    context_pre_only: final block — the text stream only feeds attention
    and produces no output stream.
    """

    dim: int
    num_heads: int
    context_pre_only: bool = False
    # SD3.5 MMDiT-X: a second, independent self-attention over the image
    # stream, sharing norm_x1's output with its own modulation, whose
    # residual lands BEFORE the MLP (reference layers/sd35.py:115-157).
    dual_attention: bool = False
    # Per-head RMS qk-norm on both joint-attention streams (and attn2)
    # — SD3.5's qk_norm: "rms_norm" (reference layers/sd3.py:433-441,
    # 512-518; sd35.py:75-89). SD3 runs without it.
    qk_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, N, D) image stream
        c: jax.Array,  # (B, L, D) text stream
        temb: jax.Array,  # (B, D)
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        b, n, d = x.shape
        l = c.shape[1]
        head_dim = d // self.num_heads

        mod_x = nn.Dense(
            6 * d, kernel_init=nn.initializers.zeros, name="mod_x"
        )(nn.silu(temb))
        (sx1, scx1, gx1, sx2, scx2, gx2) = jnp.split(mod_x, 6, axis=-1)
        n_ctx_signals = 2 if self.context_pre_only else 6
        mod_c = nn.Dense(
            n_ctx_signals * d, kernel_init=nn.initializers.zeros, name="mod_c"
        )(nn.silu(temb))
        mc = jnp.split(mod_c, n_ctx_signals, axis=-1)

        # Per-stream qkv over modulated inputs.
        norm_x1 = nn.LayerNorm(use_bias=False, use_scale=False,
                               name="norm_x1")(x)
        xh = _modulate(norm_x1, sx1, scx1)
        # Final block: AdaLayerNormContinuous emits (scale, shift) — note
        # the flipped order vs AdaLayerNormZero's (shift, scale, ...)
        # (reference layers/sd3.py:204-211 vs :175-178).
        c_shift, c_scale = (
            (mc[1], mc[0]) if self.context_pre_only else (mc[0], mc[1])
        )
        ch = _modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                    name="norm_c1")(c), c_shift, c_scale)
        qkv_x = nn.Dense(3 * d, dtype=self.dtype, name="qkv_x")(xh)
        qkv_c = nn.Dense(3 * d, dtype=self.dtype, name="qkv_c")(ch)
        to_heads = lambda t, length: t.reshape(
            b, length, self.num_heads, head_dim
        ).transpose(0, 2, 1, 3)
        qx, kx, vx = (to_heads(t, n) for t in jnp.split(qkv_x, 3, axis=-1))
        qc, kc, vc = (to_heads(t, l) for t in jnp.split(qkv_c, 3, axis=-1))
        if self.qk_norm:
            from xdiffusion_tpu.layers.norm import RMSNorm

            qx = RMSNorm(dim=head_dim, name="q_norm")(qx)
            kx = RMSNorm(dim=head_dim, name="k_norm")(kx)
            qc = RMSNorm(dim=head_dim, name="c_q_norm")(qc)
            kc = RMSNorm(dim=head_dim, name="c_k_norm")(kc)

        # Joint attention over [text; image] tokens.
        q = jnp.concatenate([qc, qx], axis=2)
        k = jnp.concatenate([kc, kx], axis=2)
        v = jnp.concatenate([vc, vx], axis=2)
        out = dot_product_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l + n, d)
        out_c, out_x = out[:, :l], out[:, l:]

        x = x + gx1[:, None] * nn.Dense(d, dtype=self.dtype, name="proj_x")(out_x)

        if self.dual_attention:
            mod2 = nn.Dense(
                3 * d, kernel_init=nn.initializers.zeros, name="mod_x2attn"
            )(nn.silu(temb))
            s2, sc2, g2 = jnp.split(mod2, 3, axis=-1)
            h2 = _modulate(norm_x1, s2, sc2)
            qkv2 = nn.Dense(3 * d, dtype=self.dtype, name="qkv_x2")(h2)
            q2, k2, v2 = (
                to_heads(t, n) for t in jnp.split(qkv2, 3, axis=-1)
            )
            if self.qk_norm:
                from xdiffusion_tpu.layers.norm import RMSNorm

                q2 = RMSNorm(dim=head_dim, name="q2_norm")(q2)
                k2 = RMSNorm(dim=head_dim, name="k2_norm")(k2)
            attn2 = dot_product_attention(q2, k2, v2)
            attn2 = attn2.transpose(0, 2, 1, 3).reshape(b, n, d)
            x = x + g2[:, None] * nn.Dense(
                d, dtype=self.dtype, name="proj_x2"
            )(attn2)

        xh = _modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                    name="norm_x2")(x), sx2, scx2)
        mlp = nn.Dense(4 * d, dtype=self.dtype, name="mlp_x1")(xh)
        mlp = nn.Dense(d, dtype=self.dtype, name="mlp_x2")(
            nn.gelu(mlp, approximate=True)
        )
        x = x + gx2[:, None] * mlp

        if self.context_pre_only:
            return x, None

        c = c + mc[2][:, None] * nn.Dense(d, dtype=self.dtype, name="proj_c")(out_c)
        ch = _modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                    name="norm_c2")(c), mc[3], mc[4])
        mlp_c = nn.Dense(4 * d, dtype=self.dtype, name="mlp_c1")(ch)
        mlp_c = nn.Dense(d, dtype=self.dtype, name="mlp_c2")(
            nn.gelu(mlp_c, approximate=True)
        )
        c = c + mc[5][:, None] * mlp_c
        return x, c


class SD3Transformer2DModel(nn.Module):
    """Instantiated with the score_network params block as a DotConfig."""

    config: Any

    def setup(self):
        cfg = self.config
        self._patch_size = int(cfg.patch_size)
        self._dim = int(cfg.num_attention_heads) * int(cfg.attention_head_dim)
        self._num_heads = int(cfg.num_attention_heads)
        self._is_learned_sigma = bool(cfg.get("is_learned_sigma", False))
        self._out_channels = (
            int(cfg.in_channels) * 2
            if self._is_learned_sigma
            else int(cfg.out_channels)
        )
        self._sample_size = int(cfg.sample_size)

        self._patch_embed = PatchEmbed(
            patch_size=self._patch_size, embed_dim=self._dim, name="pos_embed"
        )
        # SD3 builds the table at pos_embed_max_size with base_size =
        # sample grid, then center-crops the active window (reference
        # layers/sd3.py:916-963).
        grid = self._sample_size // self._patch_size
        max_size = int(cfg.get("pos_embed_max_size", 0) or grid)
        table = sincos_position_embedding_2d(
            self._dim, max_size, max_size, base_size=grid
        )
        top = (max_size - grid) // 2
        self._pos_table = (
            table.reshape(max_size, max_size, -1)[
                top : top + grid, top : top + grid
            ].reshape(grid * grid, -1)
        )
        self._time_text_embed = TimestepTextEmbed(
            embedding_dim=self._dim,
            pooled_projection_dim=int(cfg.pooled_projection_dim),
            name="time_text_embed",
        )
        self._context_embedder = nn.Dense(self._dim, name="context_embedder")
        n_layers = int(cfg.num_layers)
        self._blocks = [
            self._make_block(i, n_layers) for i in range(n_layers)
        ]
        self._final_norm = nn.LayerNorm(
            use_bias=False, use_scale=False, name="final_norm"
        )
        self._final_mod = nn.Dense(
            2 * self._dim, kernel_init=nn.initializers.zeros, name="final_mod"
        )
        self._final_proj = nn.Dense(
            self._patch_size * self._patch_size * self._out_channels,
            kernel_init=nn.initializers.zeros,
            name="final_proj",
        )

    @nn.nowrap
    def _body_params(self):
        return [
            self.variables["params"][f"block_{i}"]
            for i in range(len(self._blocks) - 1)
        ]

    @nn.nowrap
    def _can_pipeline(self, pipe) -> bool:
        """Body blocks must form a homogeneous stack whose depth divides
        the pipeline stages (SD3.5 mixes MMDiT-X blocks in — those fall
        back to the sequential loop)."""
        from xdiffusion_tpu.parallel.pipeline import stackable

        mesh, axis, _ = pipe
        body = self._body_params()
        return (
            len(body) >= mesh.shape[axis]
            and len(body) % mesh.shape[axis] == 0
            and stackable(body)
        )

    @nn.nowrap
    def _pipelined_blocks(self, tokens, ctx, temb, pipe, deterministic=True):
        """GPipe path: the (tokens, context) dual stream circulates as a
        tuple through the staged MMDiT body (parallel/pipeline.py)."""
        from xdiffusion_tpu.parallel.pipeline import run_pipelined_stack

        tmpl = self._blocks[0].clone(parent=None)

        def tmpl_apply(p, a, cc, r):
            tk, cx = a
            tk, cx_new = tmpl.apply(
                {"params": p}, tk, cx, cc, deterministic=deterministic
            )
            return (tk, cx_new if cx_new is not None else cx)

        return run_pipelined_stack(
            tmpl_apply, self._body_params(), (tokens, ctx), temb, pipe
        )

    def _make_block(self, i: int, n_layers: int) -> nn.Module:
        """Block factory; SD3.5 overrides to mix in MMDiT-X blocks."""
        return MMDiTBlock(
            dim=self._dim,
            num_heads=self._num_heads,
            context_pre_only=(i == n_layers - 1),
            qk_norm=str(self.config.get("qk_norm", "")) == "rms_norm",
            name=f"block_{i}",
        )

    def __call__(
        self, x: jax.Array, context: Dict, deterministic: bool = True
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        encoder_hidden = context["text_embeddings"]
        pooled = context["pooled_text_embeddings"]
        timestep = context["timestep"]

        b, h, w, _ = x.shape
        tokens = self._patch_embed(x) + self._pos_table[None]
        temb = self._time_text_embed(timestep, pooled)
        ctx = self._context_embedder(encoder_hidden)

        pipe = None
        if not self.is_initializing():
            from xdiffusion_tpu.parallel.pipeline import get_pipeline_context

            pipe = get_pipeline_context()
        if pipe is not None and self._can_pipeline(pipe):
            # Pipeline the homogeneous body blocks; the final
            # context_pre_only block (different param structure, drops the
            # text stream) runs unpipelined after.
            tokens, ctx = self._pipelined_blocks(
                tokens, ctx, temb, pipe, deterministic=deterministic
            )
            tokens, _ = self._blocks[-1](
                tokens, ctx, temb, deterministic=deterministic
            )
        else:
            for block in self._blocks:
                tokens, ctx_new = block(
                    tokens, ctx, temb, deterministic=deterministic
                )
                ctx = ctx_new if ctx_new is not None else ctx

        # norm_out is AdaLayerNormContinuous: (scale, shift) chunk order
        # (reference layers/sd3.py:204-211).
        scale, shift = jnp.split(self._final_mod(nn.silu(temb)), 2, axis=-1)
        tokens = _modulate(self._final_norm(tokens), shift, scale)
        tokens = self._final_proj(tokens)

        p = self._patch_size
        gh, gw = h // p, w // p
        c = self._out_channels
        out = tokens.reshape(b, gh, gw, p, p, c)
        out = jnp.einsum("bhwpqc->bhpwqc", out).reshape(
            b, gh * p, gw * p, c
        ).astype(jnp.float32)
        if self._is_learned_sigma:
            return tuple(jnp.split(out, 2, axis=-1))
        return out
