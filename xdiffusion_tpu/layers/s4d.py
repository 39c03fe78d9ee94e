"""S4D: diagonal structured state-space sequence layer.

Counterpart of /root/reference/xdiffusion/layers/s4d.py:11-113 ("On the
Parameterization and Initialization of Diagonal State Space Models",
S4D-Lin init). The SSM is applied as a length-L convolution whose kernel
is materialized from the diagonal recurrence

    K_l = 2 Re( sum_n C_n (e^{dt A_n})^l (e^{dt A_n} - 1) / A_n )

and the convolution runs via FFT — an O(L log L) dense-free op that XLA
maps well onto TPU. The layer ends with the reference's pointwise
GELU -> Conv1d(h->2h, k=1) -> GLU output transform (s4d.py:85-107).

`SequenceResidualBlock` mirrors /root/reference/xdiffusion/layers/
sequence.py:20-145 under the configuration the reference DiffuSSM config
actually uses (prenorm LayerNorm, residual_config=None, DownAvgPool
stride=1 == identity): bidirectional mode runs a SECOND complete S4D on
the SAME (un-reversed) input and fuses with a Linear(2h -> h) — the
reference never flips the sequence (sequence.py:122-129) — and there is
NO inner residual connection (sequence.py:57-59,133-135 with
residual=None).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class S4D(nn.Module):
    """Diagonal SSM over (B, L, H) sequences (reference s4d.py:63-113,
    transposed=False layout).

    Parameter layout matches the torch module 1:1 for checkpoint import:
    `C` is stored as the (H, N/2, 2) real view of the complex C (torch
    `view_as_real`), `log_dt`/`log_A_real`/`A_imag` are (H,)/(H, N/2),
    `D` is the (H,) skip, and `out_proj` is the k=1 Conv1d (h -> 2h)
    feeding a GLU.
    """

    d_model: int
    d_state: int = 64
    dt_min: float = 1e-3
    dt_max: float = 1e-1
    dropout: float = 0.0

    def _kernel(self, c, log_dt, log_a_re, a_im, length: int):
        dt = jnp.exp(log_dt)[:, None]  # (H, 1)
        a = -jnp.exp(log_a_re) + 1j * a_im  # (H, N)
        c = c[..., 0] + 1j * c[..., 1]  # (H, N) complex
        dt_a = a * dt
        # ZOH-ish discretization coefficient C (e^{dtA}-1)/A
        c_disc = c * (jnp.exp(dt_a) - 1.0) / a
        # Vandermonde over sequence positions: (H, N, L)
        l_range = jnp.arange(length)
        vander = jnp.exp(dt_a[..., None] * l_range[None, None, :])
        return 2.0 * jnp.einsum("hn,hnl->hl", c_disc, vander).real

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        b, l, h = x.shape
        assert h == self.d_model
        n = self.d_state // 2

        log_dt = self.param(
            "log_dt",
            lambda key: jax.random.uniform(key, (h,))
            * (np.log(self.dt_max) - np.log(self.dt_min))
            + np.log(self.dt_min),
        )
        # S4D-Lin initialization: A_n = -1/2 + i pi n.
        log_a_re = self.param(
            "log_A_real", lambda key: jnp.log(0.5 * jnp.ones((h, n)))
        )
        a_im = self.param(
            "A_imag",
            lambda key: jnp.broadcast_to(
                jnp.pi * jnp.arange(n), (h, n)
            ).astype(jnp.float32),
        )
        # torch.randn(cfloat): real/imag each N(0, 1/2).
        c = self.param("C", nn.initializers.normal(0.5**0.5), (h, n, 2))
        d = self.param("D", nn.initializers.normal(1.0), (h,))

        kernel = self._kernel(c, log_dt, log_a_re, a_im, l)  # (H, L)

        # Causal convolution via FFT (zero-padded to 2L).
        x_t = x.transpose(0, 2, 1)  # (B, H, L)
        fft_len = 2 * l
        sf = jnp.fft.rfft(x_t, n=fft_len)
        kf = jnp.fft.rfft(kernel, n=fft_len)
        y = jnp.fft.irfft(sf * kf[None], n=fft_len)[..., :l]
        y = y + x_t * d[None, :, None]

        y = nn.gelu(y)
        if self.dropout > 0.0:
            # Reference DropoutNd ties the mask across the length axis.
            y = nn.Dropout(
                self.dropout, broadcast_dims=(2,)
            )(y, deterministic=deterministic)
        y = y.transpose(0, 2, 1)  # (B, L, H)

        # Pointwise output transform (Conv1d k=1 -> GLU over channels).
        y = nn.Dense(2 * h, name="out_proj")(y)
        a, g = jnp.split(y, 2, axis=-1)
        return a * jax.nn.sigmoid(g)


class SequenceResidualBlock(nn.Module):
    """The reference residual block as configured by DiffuSSM
    (reference: layers/sequence.py:20-145; configs/image/mnist/
    diffussm.yaml block_config)."""

    d_input: int
    bidirectional: bool = True
    prenorm: bool = True
    dropout: float = 0.0
    d_state: int = 64

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        y = nn.LayerNorm(name="norm")(x) if self.prenorm else x
        y_for = S4D(
            d_model=self.d_input,
            d_state=self.d_state,
            dropout=self.dropout,
            name="layer",
        )(y, deterministic=deterministic)
        if self.bidirectional:
            # The reference runs the second tower on the SAME input —
            # no sequence flip (sequence.py:124).
            y_rev = S4D(
                d_model=self.d_input,
                d_state=self.d_state,
                dropout=self.dropout,
                name="reverse_layer",
            )(y, deterministic=deterministic)
            y = nn.Dense(self.d_input, name="bidirectional_linear")(
                jnp.concatenate([y_for, y_rev], axis=-1)
            )
        else:
            y = y_for
        # residual_config=None in the reference config -> no inner
        # residual; DownAvgPool(stride=1) -> identity.
        if not self.prenorm:
            y = nn.LayerNorm(name="norm")(y)
        return y, None
