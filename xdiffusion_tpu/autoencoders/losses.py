"""VAE training losses: PatchGAN discriminator + reconstruction/KL
objective.

Behavioral counterpart of /root/reference/xdiffusion/autoencoders/
losses.py:15-776 (LDM's LPIPSWithDiscriminator): pixel L1 + perceptual
(LPIPS-style, see perceptual.py for the offline feature net) +
learned-logvar NLL + KL + adversarial term with a hinge/vanilla PatchGAN;
3D Haar wavelet loss and the paired reconstruction-GAN variant
(losses.py:537,175-200) are wired when their knobs are set.

The adaptive generator/discriminator weight (grad-norm ratio at the
decoder's last layer, reference losses.py:103-118) is implemented via a
single jax.vjp whose linearization is shared by both cotangent pulls
(`adaptive_adversarial_weight` below) and enabled by
`use_adaptive_adversarial_weight` (reference default True; the
Hunyuan/OpenSora configs set it False explicitly).

Known reference quirk NOT replicated: the reference's generator loss has
a ternary-precedence bug (losses.py:207-211: `A if use_nll else B + C +
D` binds as `A if use_nll else (B+C+D)`), which silently drops the KL
and adversarial terms whenever use_nll — we compose nll + kl + adv as
the surrounding code clearly intends.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

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
    output_nc: int = 1

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
        return nn.Conv(self.output_nc, (4, 4), name="conv_out")(h)


class NLayerDiscriminator3D(nn.Module):
    """3D PatchGAN discriminator over (B, F, H, W, C) videos (reference:
    the use_3d discriminator in the causal-VAE losses). Same layout as the
    2D PatchGAN with (3, 4, 4) spatiotemporal kernels; the first stride
    keeps time (causal VAEs compress time less than space)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    output_nc: int = 1

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
        return nn.Conv(self.output_nc, (3, 4, 4), name="conv_out")(h)


class LPIPSWithDiscriminator(nn.Module):
    """Two-phase VAE-GAN loss: optimizer_idx 0 trains the autoencoder
    (rec NLL / exp(logvar) + kl_weight*KL + disc_weight*G-loss, gated by
    disc_start), idx 1 trains the discriminator.

    5D (B, F, H, W, C) inputs are supported: with use_3d the PatchGAN is a
    3D conv stack over the whole clip, otherwise frames fold into the
    batch for a per-frame 2D discriminator.

    perceptual_weight > 0 adds the LPIPS-style multi-scale feature
    distance (perceptual.py); wavelet_loss_weight > 0 adds the 3D Haar
    wavelet L1 (5D inputs); use_reconstruction_gan switches to the paired
    (recon, input) two-logit discriminator (reference losses.py:175-260).
    """

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
    # learned_logvar=False takes the output log-variance from the
    # posterior instead of a learned scalar (reference losses.py:150-159);
    # use_nll=False drops the 1/exp(logvar) NLL weighting and uses the
    # plain mean reconstruction loss.
    learned_logvar: bool = True
    use_nll: bool = True
    # Reference default True (losses.py:39); when on, the trainer
    # supplies `adaptive_weight` computed by
    # `adaptive_adversarial_weight` and it replaces the fixed
    # disc/adversarial weight.
    use_adaptive_adversarial_weight: bool = True

    def setup(self):
        assert self.disc_loss in ("hinge", "vanilla")
        self.logvar = self.param(
            "logvar", lambda key: jnp.full((), self.logvar_init)
        )
        disc_cls = (
            NLayerDiscriminator3D if self.use_3d else NLayerDiscriminator
        )
        in_mult = 2 if self.use_reconstruction_gan else 1
        self.discriminator = disc_cls(
            input_nc=self.disc_in_channels * in_mult,
            ndf=64,
            n_layers=self.disc_num_layers,
            output_nc=2 if self.use_reconstruction_gan else 1,
        )

    def __call__(
        self,
        inputs: jax.Array,
        reconstructions: jax.Array,
        posterior,
        optimizer_idx: int,
        global_step: jax.Array,
        adaptive_weight: Optional[jax.Array] = None,
        return_nll_g: bool = False,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        diff = inputs - reconstructions
        if self.rec_loss == "l2":
            rec_loss = self.pixelloss_weight * diff**2
        else:
            rec_loss = self.pixelloss_weight * jnp.abs(diff)

        p_loss = jnp.zeros(())
        if self.perceptual_weight > 0.0:
            from xdiffusion_tpu.autoencoders.perceptual import (
                perceptual_distance,
            )

            p_on = jnp.where(
                global_step >= self.perceptual_start,
                self.perceptual_weight,
                0.0,
            )
            p_loss = perceptual_distance(inputs, reconstructions)
            rec_loss = rec_loss + p_on * p_loss
            p_loss = jnp.mean(p_loss)

        w_loss = jnp.zeros(())
        if self.wavelet_loss_weight > 0.0:
            from xdiffusion_tpu.autoencoders.perceptual import wavelet_loss_3d

            assert inputs.ndim == 5, "wavelet loss needs (B,F,H,W,C) video"
            w_on = jnp.where(
                global_step >= self.wavelet_start,
                self.wavelet_loss_weight,
                0.0,
            )
            w_loss = wavelet_loss_3d(reconstructions, inputs)
            rec_loss = rec_loss + w_on * w_loss
            w_loss = jnp.mean(w_loss)

        if self.learned_logvar:
            logvar = self.logvar
        else:
            # Per-sample output logvar from the posterior (reference
            # losses.py:153-159): average to a (B, 1, ..., 1) plane.
            axes = tuple(range(1, posterior.logvar.ndim))
            logvar = jnp.mean(posterior.logvar, axis=axes).reshape(
                (-1,) + (1,) * (rec_loss.ndim - 1)
            )
        if self.use_nll:
            nll = rec_loss / jnp.exp(logvar) + logvar
            nll_loss = jnp.sum(nll) / nll.shape[0]
        else:
            nll_loss = jnp.mean(rec_loss)
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
            if self.use_reconstruction_gan:
                # Paired (recon, input) discriminator with (fake, real)
                # logit channels; only the fake logit drives G
                # (reference losses.py:175-189).
                logits = self.discriminator(
                    jnp.concatenate([disc_rec, disc_in], axis=-1)
                )
                logits_fake, _ = jnp.split(logits, 2, axis=-1)
            else:
                logits_fake = self.discriminator(disc_rec)
            g_loss = -jnp.mean(logits_fake)
            if return_nll_g:
                # For adaptive_adversarial_weight's vjp: the two scalars
                # whose last-layer gradients are balanced (reference
                # losses.py:103-118).
                return nll_loss, g_loss
            if adaptive_weight is not None:
                # d_weight = clamp(|dNLL/dw|/|dG/dw|) * adversarial_weight
                # (reference losses.py:115-117).
                adv_weight = adaptive_weight * adv_weight
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
                "p_loss": p_loss,
                "w_loss": w_loss,
                "d_weight": jnp.asarray(adv_weight, jnp.float32),
                "logvar": jnp.mean(logvar),
            }

        # optimizer_idx == 1: discriminator sees detached reconstructions.
        disc_in = jax.lax.stop_gradient(disc_in)
        disc_rec = jax.lax.stop_gradient(disc_rec)
        if self.use_reconstruction_gan:
            # Two passes with swapped pair order; both logit channels
            # supervised (reference losses.py:225-260).
            fr = self.discriminator(
                jnp.concatenate([disc_rec, disc_in], axis=-1)
            )
            logits_fake_a, logits_real_a = jnp.split(fr, 2, axis=-1)
            rf = self.discriminator(
                jnp.concatenate([disc_in, disc_rec], axis=-1)
            )
            logits_real_b, logits_fake_b = jnp.split(rf, 2, axis=-1)
            disc_loss = d_fn(logits_real_a, logits_fake_a) + d_fn(
                logits_real_b, logits_fake_b
            )
            logits_real = logits_real_a + logits_real_b
            logits_fake = logits_fake_a + logits_fake_b
        else:
            logits_real = self.discriminator(disc_in)
            logits_fake = self.discriminator(disc_rec)
            disc_loss = d_fn(logits_real, logits_fake)
        d_loss = disc_on * disc_loss
        return d_loss, {
            "disc_loss": d_loss,
            "logits_real": jnp.mean(logits_real),
            "logits_fake": jnp.mean(logits_fake),
        }


def find_kernel_path(params: Dict, marker: str) -> Tuple:
    """Locate the unique kernel leaf whose path contains `marker` —
    used to address the decoder's output convolution for the adaptive
    adversarial weight (reference losses.py:103-118 differentiates
    w.r.t. `decoder.conv_out.weight`)."""
    from flax.traverse_util import flatten_dict

    hits = [
        p
        for p in flatten_dict(params)
        if marker in "/".join(map(str, p)) and p[-1] == "kernel"
    ]
    if len(hits) != 1:
        raise ValueError(
            f"expected exactly one kernel matching {marker!r}, got {hits}"
        )
    return hits[0]


def adaptive_adversarial_weight(
    loss_module: LPIPSWithDiscriminator,
    disc_params: Dict,
    ae_params: Dict,
    last_layer_path: Tuple,
    forward_fn,
    inputs: jax.Array,
    global_step: jax.Array,
) -> jax.Array:
    """The reference's adaptive generator/discriminator balance
    (losses.py:103-118): |d nll / d w_last| / (|d g / d w_last| + 1e-4)
    clamped to [0, 1e4], stop-gradient. `forward_fn(ae_params) ->
    (reconstructions, posterior)`. One jax.vjp linearizes the forward
    once; both cotangent pulls share it (the JAX analogue of the two
    retain_graph autograd.grad calls)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(ae_params))
    w0 = flat[last_layer_path]

    def heads(w_last):
        flat2 = dict(flat)
        flat2[last_layer_path] = w_last
        recon, posterior = forward_fn(unflatten_dict(flat2))
        return loss_module.apply(
            disc_params,
            inputs,
            recon,
            posterior,
            0,
            global_step,
            return_nll_g=True,
        )

    _, vjp = jax.vjp(heads, w0)
    one, zero = jnp.ones(()), jnp.zeros(())
    nll_grads = vjp((one, zero))[0]
    g_grads = vjp((zero, one))[0]
    d_weight = jnp.linalg.norm(nll_grads.reshape(-1)) / (
        jnp.linalg.norm(g_grads.reshape(-1)) + 1e-4
    )
    return jax.lax.stop_gradient(jnp.clip(d_weight, 0.0, 1e4))


def maybe_adaptive_weight(
    loss_module,
    params: Dict,
    forward_fn,
    inputs: jax.Array,
    global_step: jax.Array,
    optimizer_idx: int,
    marker: str,
) -> Optional[jax.Array]:
    """Trainer-side convenience: the adaptive weight when the loss wants
    it and this is the generator phase, else None (fixed weight)."""
    if optimizer_idx != 0 or not getattr(
        loss_module, "use_adaptive_adversarial_weight", False
    ):
        return None
    path = find_kernel_path(params["ae"], marker)
    return adaptive_adversarial_weight(
        loss_module,
        params["disc"],
        params["ae"],
        path,
        forward_fn,
        inputs,
        global_step,
    )
