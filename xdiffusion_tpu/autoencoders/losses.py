"""VAE training losses: PatchGAN discriminator + reconstruction/KL
objective.

Behavioral counterpart of /root/reference/xdiffusion/autoencoders/
losses.py:15-776 (LDM's LPIPSWithDiscriminator): pixel L1 + learned-logvar
NLL + KL + adversarial term with a hinge/vanilla PatchGAN. Differences in
this rebuild, both offline-driven:

- the perceptual (LPIPS/VGG) term requires pretrained VGG weights; with
  none available it contributes 0 (reference MNIST-scale VAE configs train
  fine without it);
- the adaptive generator/discriminator weight (grad-norm ratio at the
  decoder's last layer) is replaced by the configured fixed disc_weight.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (reference: losses.py:300-370). GroupNorm in
    place of BatchNorm keeps the step stateless/jit-pure."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), name="conv_in")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(self.ndf * (2**n), self.ndf * 8)
            h = nn.Conv(nf, (4, 4), strides=(2, 2), use_bias=False,
                        name=f"conv_{n}")(h)
            h = nn.GroupNorm(
                num_groups=32 if nf % 32 == 0 else max(1, nf // 4),
                name=f"norm_{n}",
            )(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(self.ndf * (2**self.n_layers), self.ndf * 8)
        h = nn.Conv(nf, (4, 4), use_bias=False, name="conv_last")(h)
        h = nn.GroupNorm(
            num_groups=32 if nf % 32 == 0 else max(1, nf // 4), name="norm_last"
        )(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), name="conv_out")(h)


class NLayerDiscriminator3D(nn.Module):
    """3D PatchGAN discriminator over (B, F, H, W, C) videos (reference:
    the use_3d discriminator in the causal-VAE losses). Same layout as the
    2D PatchGAN with (3, 4, 4) spatiotemporal kernels; the first stride
    keeps time (causal VAEs compress time less than space)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.ndf, (3, 4, 4), strides=(1, 2, 2), name="conv_in")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(self.ndf * (2**n), self.ndf * 8)
            h = nn.Conv(nf, (3, 4, 4), strides=(2, 2, 2), use_bias=False,
                        name=f"conv_{n}")(h)
            h = nn.GroupNorm(
                num_groups=32 if nf % 32 == 0 else max(1, nf // 4),
                name=f"norm_{n}",
            )(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(self.ndf * (2**self.n_layers), self.ndf * 8)
        h = nn.Conv(nf, (3, 4, 4), use_bias=False, name="conv_last")(h)
        h = nn.GroupNorm(
            num_groups=32 if nf % 32 == 0 else max(1, nf // 4), name="norm_last"
        )(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (3, 4, 4), name="conv_out")(h)


class LPIPSWithDiscriminator(nn.Module):
    """Two-phase VAE-GAN loss: optimizer_idx 0 trains the autoencoder
    (rec NLL / exp(logvar) + kl_weight*KL + disc_weight*G-loss, gated by
    disc_start), idx 1 trains the discriminator.

    5D (B, F, H, W, C) inputs are supported: with use_3d the PatchGAN is a
    3D conv stack over the whole clip, otherwise frames fold into the
    batch for a per-frame 2D discriminator. The reference's wavelet /
    reconstruction-GAN extras are accepted and inert (documented parity
    deviation)."""

    disc_start: int = 0
    kl_weight: float = 1e-6
    disc_weight: float = 0.5
    perceptual_weight: float = 0.0
    disc_factor: float = 1.0
    logvar_init: float = 0.0
    disc_in_channels: int = 3
    disc_num_layers: int = 3
    disc_loss: str = "hinge"
    pixelloss_weight: float = 1.0
    rec_loss: str = "l1"
    use_3d: bool = False
    # Reference knobs accepted for config compatibility:
    kl_start: int = 0
    perceptual_start: int = 0
    adversarial_start: int = -1   # -1: use disc_start
    adversarial_weight: float = -1.0  # <0: use disc_weight
    disc_conditional: bool = False
    wavelet_start: int = 0
    wavelet_loss_weight: float = 0.0
    use_3d_conv: bool = False
    use_reconstruction_gan: bool = False

    def setup(self):
        assert self.disc_loss in ("hinge", "vanilla")
        self.logvar = self.param(
            "logvar", lambda key: jnp.full((), self.logvar_init)
        )
        disc_cls = (
            NLayerDiscriminator3D if self.use_3d else NLayerDiscriminator
        )
        self.discriminator = disc_cls(
            input_nc=self.disc_in_channels,
            ndf=64,
            n_layers=self.disc_num_layers,
        )

    def __call__(
        self,
        inputs: jax.Array,
        reconstructions: jax.Array,
        posterior,
        optimizer_idx: int,
        global_step: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        diff = inputs - reconstructions
        if self.rec_loss == "l2":
            rec_loss = self.pixelloss_weight * diff**2
        else:
            rec_loss = self.pixelloss_weight * jnp.abs(diff)
        # (perceptual term omitted offline; see module docstring)
        nll = rec_loss / jnp.exp(self.logvar) + self.logvar
        nll_loss = jnp.sum(nll) / nll.shape[0]
        kl_on = jnp.where(global_step >= self.kl_start, 1.0, 0.0)
        kl_loss = kl_on * jnp.mean(posterior.kl())

        # Video inputs with a 2D discriminator: frames fold into batch.
        disc_in = inputs
        disc_rec = reconstructions
        if inputs.ndim == 5 and not self.use_3d:
            fold = lambda v: v.reshape((-1,) + v.shape[2:])
            disc_in, disc_rec = fold(inputs), fold(reconstructions)

        d_fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        adv_start = (
            self.adversarial_start if self.adversarial_start >= 0
            else self.disc_start
        )
        adv_weight = (
            self.adversarial_weight if self.adversarial_weight >= 0
            else self.disc_weight
        )
        disc_on = jnp.where(global_step >= adv_start, self.disc_factor, 0.0)

        if optimizer_idx == 0:
            logits_fake = self.discriminator(disc_rec)
            g_loss = -jnp.mean(logits_fake)
            loss = (
                nll_loss
                + self.kl_weight * kl_loss
                + disc_on * adv_weight * g_loss
            )
            return loss, {
                "total_loss": loss,
                "nll_loss": nll_loss,
                "kl_loss": kl_loss,
                "g_loss": g_loss,
                "logvar": self.logvar,
            }

        # optimizer_idx == 1: discriminator sees detached reconstructions.
        logits_real = self.discriminator(jax.lax.stop_gradient(disc_in))
        logits_fake = self.discriminator(
            jax.lax.stop_gradient(disc_rec)
        )
        d_loss = disc_on * d_fn(logits_real, logits_fake)
        return d_loss, {
            "disc_loss": d_loss,
            "logits_real": jnp.mean(logits_real),
            "logits_fake": jnp.mean(logits_fake),
        }
