"""Gaussian diffusion process (DDPM / continuous / rectified-flow losses).

Behavioral counterpart of the reference workhorse
(/root/reference/xdiffusion/diffusion/ddpm.py:40-1046), re-cut along JAX's
functional seams:

- The process object owns *structure* (score-network module, scheduler
  tables, preprocessors, CFG config) — all static at trace time.
- Parameters are explicit pytrees threaded through pure methods:
  `loss_on_batch(params, rng, images, context)` is the jittable training
  objective; `sample_fn(...)` builds the single-scan sampling program
  (see diffusion/sampling.py).
- Training-time CFG dropout is a `jnp.where` mask over array signals
  (string prompts are resolved to arrays by host-side preprocessors
  *before* jit, per the context pipeline design).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from xdiffusion_tpu.config import (
    DotConfig,
    instantiate_from_config,
    type_from_config,
)
from xdiffusion_tpu.diffusion import PredictionType, prediction_type_from_config
from xdiffusion_tpu.diffusion.sampling import build_sample_loop
from xdiffusion_tpu.importance_sampling import UniformSampler
from xdiffusion_tpu.scheduler import elementwise_loss
from xdiffusion_tpu.utils import (
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
    normalize_to_neg_one_to_one,
    prob_mask_like,
)


class GaussianDiffusion_DDPM:
    """Config-driven diffusion process over a score network."""

    def __init__(self, config: DotConfig):
        self._config = config
        diff = config.diffusion

        self._prediction_type = prediction_type_from_config(diff.parameterization)

        # Score network: linen module instantiated with the params block as
        # a config struct (reference contract: score_networks take a
        # DotConfig).
        sn_cfg = diff.score_network
        sn_cls = type_from_config(sn_cfg.to_dict())
        self._score_network = sn_cls(config=DotConfig(sn_cfg.params.to_dict()))
        self._is_learned_sigma = bool(sn_cfg.params.is_learned_sigma)
        # MoE score networks (layers/moe.py) sow a load-balance auxiliary
        # loss; fold it into the training objective with this weight
        # (Switch Transformer default 1e-2).
        _n_exp = int(sn_cfg.params.get("num_experts", 0) or 0)
        self._moe_aux_weight = (
            float(sn_cfg.params.get("moe_aux_loss_weight", 0.01))
            if _n_exp > 1
            else 0.0
        )

        # Scheduler + importance sampler.
        self._noise_scheduler = instantiate_from_config(
            diff.noise_scheduler.to_dict()
        )
        is_cfg = diff.noise_scheduler.params.get("importance_sampler")
        if is_cfg is not None and "target" in is_cfg:
            self._importance_sampler = instantiate_from_config(is_cfg.to_dict())
        else:
            self._importance_sampler = UniformSampler(self._noise_scheduler.steps())

        # Host-side context preprocessors (prompt -> tokens/embeddings).
        self._context_preprocessors = [
            instantiate_from_config(c) for c in diff.get("context_preprocessing", [])
        ]
        # Device-side input preprocessor (e.g. super-res concat).
        ip_cfg = diff.get("input_preprocessing")
        self._input_preprocessor = (
            instantiate_from_config(ip_cfg.to_dict()) if ip_cfg is not None else None
        )

        # Classifier-free guidance config.
        cfg_block = diff.get("classifier_free_guidance")
        if cfg_block is not None:
            self._classifier_free_guidance = float(
                cfg_block.classifier_free_guidance
            )
            self._unconditional_guidance_probability = float(
                cfg_block.unconditional_guidance_probability
            )
            self._cfg_signals = list(cfg_block.signals)
            self._unconditional_context_adapter = instantiate_from_config(
                cfg_block.unconditional_context.to_dict()
            )
        else:
            self._classifier_free_guidance = 0.0
            self._unconditional_guidance_probability = 0.0
            self._cfg_signals = []
            self._unconditional_context_adapter = None

        # Default reverse-process sampler from the sampling block.
        sampling = diff.get("sampling")
        if sampling is not None and "target" in sampling:
            self._reverse_process_sampler = instantiate_from_config(
                sampling.to_dict()
            )
        else:
            from xdiffusion_tpu.samplers.ancestral import AncestralSampler

            self._reverse_process_sampler = AncestralSampler()

        # Optional SDE (rectified flow shells etc.).
        sde_cfg = diff.get("sde")
        self._sde = (
            instantiate_from_config(sde_cfg.to_dict()) if sde_cfg is not None else None
        )

        # Latent diffusion: optional frozen VAE. Its parameters are loaded
        # from a checkpoint by the trainer (set_latent_encoder_params) and
        # closed over by the jitted programs as constants; the latent scale
        # factor (reference ddpm.py:166-189 computes 1/std on first batch)
        # is an explicit init step here (compute_latent_scale).
        le_cfg = diff.get("latent_encoder")
        self._latent_encoder = (
            instantiate_from_config(le_cfg.to_dict(), use_config_struct=True)
            if le_cfg is not None
            else None
        )
        self._latent_encoder_params = None
        self._latent_scale_factor: Optional[float] = None
        self._extra_samplers: Dict[Any, Any] = {}
        self._sample_fn_cache: Dict[Any, Callable] = {}

    # -- protocol accessors (reference DiffusionModel interface) ----------

    def config(self) -> DotConfig:
        return self._config

    def models(self) -> List[Any]:
        return [self]

    def score_network(self):
        return self._score_network

    def noise_scheduler(self):
        return self._noise_scheduler

    def importance_sampler(self):
        return self._importance_sampler

    def classifier_free_guidance(self) -> float:
        return self._classifier_free_guidance

    def prediction_type(self) -> PredictionType:
        return self._prediction_type

    def is_learned_sigma(self) -> bool:
        return self._is_learned_sigma

    def sde(self):
        return self._sde

    def dynamic_thresholding_config(self):
        diff = self._config.diffusion
        return diff.get("dynamic_thresholding")

    # -- latent diffusion ----------------------------------------------------

    def latent_encoder(self):
        return self._latent_encoder

    def set_latent_encoder_params(self, params) -> None:
        self._latent_encoder_params = params
        self._sample_fn_cache_clear()

    def compute_latent_scale(self, images: jax.Array, rng: jax.Array) -> float:
        """scale = 1 / std(z0) over a representative batch
        (reference ddpm.py:171-176, made an explicit init step)."""
        assert self._latent_encoder is not None
        z = self._latent_encoder.encode_to_latents(
            self._latent_encoder_params, images, rng
        )
        self._latent_scale_factor = float(1.0 / jnp.std(z))
        self._sample_fn_cache_clear()
        return self._latent_scale_factor

    def set_latent_scale(self, scale: float) -> None:
        self._latent_scale_factor = float(scale)
        self._sample_fn_cache_clear()

    def _sample_fn_cache_clear(self):
        self._sample_fn_cache = {}

    # -- parameters --------------------------------------------------------

    def example_batch(self, batch_size: int = 2) -> Tuple[jax.Array, Dict]:
        """A fully-populated fake (x, context) matching the config's input
        signature — the de-facto contract of the context protocol
        (reference print_model_summary, ddpm.py:694-793)."""
        diff = self._config.diffusion
        sn = diff.score_network.params
        s = sn.input_spatial_size
        spatial = [s[0], s[1]] if isinstance(s, list) else [s, s]
        if "input_number_of_frames" in sn:
            x = jnp.zeros(
                (
                    batch_size,
                    sn.input_number_of_frames,
                    spatial[0],
                    spatial[1],
                    sn.input_channels,
                )
            )
        else:
            x = jnp.zeros(
                (batch_size, spatial[0], spatial[1], sn.input_channels)
            )
        context: Dict[str, Any] = {}
        if self._noise_scheduler.continuous():
            context["timestep"] = jnp.zeros((batch_size,), dtype=jnp.float32)
            context["logsnr_t"] = jnp.zeros((batch_size,), dtype=jnp.float32)
        else:
            context["timestep"] = jnp.zeros((batch_size,), dtype=jnp.int32)
        if sn.get("is_class_conditional", False):
            context["classes"] = jnp.zeros((batch_size,), dtype=jnp.int32)
        signals = (
            list(sn.conditioning.signals) if "conditioning" in sn else []
        )
        if "text_tokens" in signals:
            text_len = 128
            for c in diff.get("context_preprocessing", []):
                params = c.get("params", {}) or {}
                if "text_context_size" in params:
                    text_len = int(params["text_context_size"])
            context["text_tokens"] = jnp.zeros(
                (batch_size, text_len), dtype=jnp.int32
            )
        if "super_resolution" in self._config:
            sr = self._config.super_resolution
            prep = diff.get("input_preprocessing", {})
            prep_params = prep.get("params", {}) if prep else {}
            is_temporal = bool(prep_params.get("is_temporal", False))
            if "input_number_of_frames" in sn:
                if is_temporal:
                    # Temporal SR: low-res has fewer FRAMES at full spatial.
                    lr_shape = (
                        batch_size,
                        sr.low_resolution_size,
                        spatial[0],
                        spatial[1],
                        sn.output_channels,
                    )
                else:
                    lr_shape = (
                        batch_size,
                        sn.input_number_of_frames,
                        sr.low_resolution_size,
                        sr.low_resolution_size,
                        sn.output_channels,
                    )
            else:
                lr_shape = (
                    batch_size,
                    sr.low_resolution_size,
                    sr.low_resolution_size,
                    sn.output_channels,
                )
            context[sr.conditioning_key] = jnp.zeros(lr_shape)
            if self._noise_scheduler.continuous():
                context["augmentation_timestep"] = jnp.zeros(
                    (batch_size,), dtype=jnp.float32
                )
            else:
                context["augmentation_timestep"] = jnp.zeros(
                    (batch_size,), dtype=jnp.int32
                )
        # Frozen-encoder conditioning (CLIP/T5/CLAP embedders in
        # context_preprocessing) puts embedding arrays in the context before
        # the traced forward ever runs; probe them with empty prompts so
        # init sees the full signature.
        if self._context_preprocessors:
            probe = self.preprocess_context(
                {"text_prompts": [""] * batch_size}
            )
            for key, value in probe.items():
                if key not in context and hasattr(value, "shape"):
                    context[key] = value
        return x, context

    def init_params(self, rng: jax.Array, batch_size: int = 2):
        x, context = self.example_batch(batch_size)
        return jax.jit(self._score_network.init)(rng, x, context)

    # -- forward plumbing ---------------------------------------------------

    def process_input(self, x: jax.Array, context: Dict) -> jax.Array:
        if self._input_preprocessor is None:
            return x
        return self._input_preprocessor(
            x=x, context=context, noise_scheduler=self._noise_scheduler
        )

    def predict_score(
        self,
        params,
        x: jax.Array,
        context: Dict,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        with_intermediates: bool = False,
    ):
        rngs = {"dropout": rng} if rng is not None else None

        if with_intermediates:
            # Training path for MoE networks: collect the sown
            # 'intermediates' (load-balance aux losses) alongside the
            # prediction. Bypasses batch chunking (loss batches are
            # per-chip sized; chunking is a large-batch sampling fix).
            out, mods = self._score_network.apply(
                params, x, context, deterministic=deterministic,
                rngs=rngs, mutable=["intermediates"],
            )
            aux = jnp.zeros((), dtype=jnp.float32)
            n_aux = 0
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                mods.get("intermediates", {})
            )[0]:
                if any("moe_aux_loss" in str(k) for k in path):
                    aux = aux + jnp.asarray(leaf, jnp.float32)
                    n_aux += 1
            if n_aux > 1:  # mean over MoE blocks: depth-independent scale
                aux = aux / n_aux
            return out, aux

        def apply(xx, cc):
            return self._score_network.apply(
                params, xx, cc, deterministic=deterministic, rngs=rngs
            )

        if deterministic:
            # Large batches are evaluated in <=64-sample chunks inside
            # the jitted program so XLA keeps the channels-minor
            # activation layout (see ops/batch_chunk.py for the measured
            # root cause). Deterministic-only: chunking would reuse the
            # dropout rng across chunks.
            from xdiffusion_tpu.ops.batch_chunk import chunk_batched_apply

            return chunk_batched_apply(apply, x, context)
        return apply(x, context)

    def preprocess_context(self, context: Dict) -> Dict:
        """Host-side context preprocessing (tokenization etc.). Run BEFORE
        handing the context to a jitted program."""
        for preprocessor in self._context_preprocessors:
            context = preprocessor(context)
        # Score networks may declare a host-side prompt tokenizer in their
        # projection dict (e.g. T5TextPromptsToTokens); strings must resolve
        # to arrays here, outside the traced program.
        if "text_prompts" in context:
            proj = self._host_prompt_projection()
            if proj is not None:
                context = dict(context)
                context["text_tokens"] = proj(context["text_prompts"])
                context.pop("text_prompts")
        return context

    def _host_prompt_projection(self):
        if not hasattr(self, "_host_prompt_proj_cache"):
            self._host_prompt_proj_cache = None
            cond = self._config.diffusion.score_network.params.get("conditioning")
            if cond is not None and "projections" in cond:
                projs = cond.projections
                if "text_prompts" in projs:
                    candidate = instantiate_from_config(
                        projs["text_prompts"].to_dict()
                    )
                    if getattr(candidate, "host_side", False):
                        self._host_prompt_proj_cache = candidate
        return self._host_prompt_proj_cache

    def unconditional_context(self, context: Dict) -> Optional[Dict]:
        if self._unconditional_context_adapter is None:
            return None
        out = self._unconditional_context_adapter(context)
        return out if isinstance(out, dict) else None

    # -- training loss -------------------------------------------------------

    def loss_on_batch(
        self,
        params,
        rng: jax.Array,
        images: jax.Array,
        context: Dict,
        timesteps: Optional[jax.Array] = None,
        loss_weights: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
        deterministic: bool = False,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Training objective on an NHWC batch in [0, 1]. Pure and jit-safe.

        When the configured importance sampler is host-side (loss-history
        based), `timesteps`/`loss_weights` are supplied by the train loop;
        otherwise times are drawn from `rng` on-device. `noise` injects the
        epsilon target and `deterministic=True` disables dropout — both are
        for golden-parity tests against the reference loss
        (reference ddpm.py:208-210), never set by the train loops.
        """
        b = images.shape[0]
        context = dict(context)
        # One split for every consumer: split(k, 2) yields the same leading
        # keys as split(k, 4), so re-splitting `rng` for the VAE would make
        # rng_enc == rng_eps and leak the diffusion noise target into z_0.
        rng_t, rng_eps, rng_cfg, rng_drop, rng_enc = jax.random.split(rng, 5)

        if self._latent_encoder is not None:
            assert self._latent_scale_factor is not None, (
                "call compute_latent_scale()/set_latent_scale() before training"
            )
            z_0 = self._latent_encoder.encode_to_latents(
                self._latent_encoder_params, images, rng_enc
            )
            z_0 = z_0 * self._latent_scale_factor
        else:
            z_0 = normalize_to_neg_one_to_one(images)

        if timesteps is not None:
            t = timesteps
            weights = (
                loss_weights
                if loss_weights is not None
                else jnp.ones((b,), dtype=jnp.float32)
            )
        else:
            t, weights = self._noise_scheduler.sample_random_times(rng_t, b)
        if self._noise_scheduler.continuous():
            context["logsnr_t"] = self._noise_scheduler.logsnr(t)
        context["timestep"] = t

        epsilon = (
            noise
            if noise is not None
            else jax.random.normal(rng_eps, z_0.shape, dtype=z_0.dtype)
        )
        x_t = self._noise_scheduler.q_sample(x_start=z_0, t=t, noise=epsilon)

        # Masked video diffusion (FDM/OpenSora): conditioned frames keep
        # their clean values (mask True = generate; reference ddpm.py:217).
        if "video_mask" in context:
            mask = context["video_mask"][:, : x_t.shape[1], None, None, None]
            x_t = jnp.where(mask, x_t, z_0)
            # Networks that re-splice observed frames at their input (the
            # FDM factorized UNet reads context["x0"]) need the clean
            # frames; without this they would splice zeros over the
            # conditioning frames.
            context["x0"] = z_0

        # Training-time CFG: drop conditioning signals to their
        # unconditional values with the configured probability.
        if (
            self._unconditional_guidance_probability > 0.0
            and self._unconditional_context_adapter is not None
        ):
            uncond = self.unconditional_context(context)
            mask = prob_mask_like(
                rng_cfg, (b,), self._unconditional_guidance_probability
            )
            # Reference configs may name pre-tokenization signals
            # ("text_prompts"); inside the jitted loss those have already
            # resolved to arrays — drop whichever realization is present.
            _TEXT_REALIZATIONS = (
                "text_tokens", "text_embeddings", "t5_text_embeddings",
                "clip_text_embeddings", "clap_embeddings",
            )
            for key in self._cfg_signals:
                keys = (key,)
                if key == "text_prompts":
                    keys = tuple(
                        k for k in _TEXT_REALIZATIONS if k in context
                    ) or keys
                for k in keys:
                    if k not in context or k not in uncond:
                        continue
                    cond_sig = context[k]
                    uncond_sig = uncond[k]
                    if not hasattr(cond_sig, "ndim"):
                        # Unresolved host-only signal (e.g. a prompt-string
                        # list that a caller left in the context).
                        continue
                    m = mask.reshape((b,) + (1,) * (cond_sig.ndim - 1))
                    context[k] = jnp.where(m, uncond_sig, cond_sig)

        context["preprocessor_rng"] = jax.random.fold_in(rng_drop, 7)
        x_in = self.process_input(x_t, context)
        moe_aux = None
        if self._moe_aux_weight > 0.0:
            model_output, moe_aux = self.predict_score(
                params, x_in, context, deterministic=deterministic,
                rng=rng_drop, with_intermediates=True,
            )
        else:
            model_output = self.predict_score(
                params, x_in, context, deterministic=deterministic,
                rng=rng_drop,
            )

        if self._is_learned_sigma:
            model_prediction, learned_variance = model_output
        else:
            model_prediction = model_output

        if self._prediction_type == PredictionType.EPSILON:
            prediction_target = epsilon
        elif self._prediction_type == PredictionType.V:
            prediction_target = self._noise_scheduler.predict_v_from_x_and_epsilon(
                x=z_0, epsilon=epsilon, t=t
            )
        elif self._prediction_type == PredictionType.RECTIFIED_FLOW:
            prediction_target = z_0 - epsilon
        else:
            raise NotImplementedError(
                f"Prediction type {self._prediction_type} not implemented."
            )

        loss_type = getattr(self._noise_scheduler, "loss_type", "l2")
        mse_loss = mean_flat(
            elementwise_loss(loss_type, model_prediction, prediction_target)
        )

        vb_loss = jnp.zeros_like(mse_loss)
        if self._is_learned_sigma:
            # Freeze the prediction path so the VLB term only trains the
            # variance head, then rescale by 1e-3 (Improved-DDPM hybrid
            # objective; reference ddpm.py:300-327).
            frozen = (jax.lax.stop_gradient(model_prediction), learned_variance)
            vb_loss = self._vb_bits_per_dim(
                epsilon_v_param=frozen,
                x_0=z_0,
                x_t=x_t,
                context=context,
                clip_denoised=False,
            )
            vb_loss = vb_loss * 1e-3

        total = (mse_loss + vb_loss) * weights
        objective = total.mean()
        metrics = {
            "loss": objective,
            "mse_loss": mse_loss.mean(),
            "vb_loss": vb_loss.mean(),
            "timesteps": t,
            "loss_per_example": jax.lax.stop_gradient(mse_loss + vb_loss),
        }
        if moe_aux is not None:
            objective = objective + self._moe_aux_weight * moe_aux
            metrics["moe_aux_loss"] = moe_aux
            metrics["loss"] = objective
        return objective, metrics

    def distillation_loss_on_batch(
        self,
        params,
        teacher_params,
        rng: jax.Array,
        images: jax.Array,
        context: Dict,
        N: int,
        teacher_process: Optional["GaussianDiffusion_DDPM"] = None,
        timesteps: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict]:
        """Progressive distillation (Salimans & Ho 2022): the student learns
        to match TWO teacher DDIM steps with one step. v-param continuous
        schedulers only (reference ddpm.py:338-542). N may be traced.

        timesteps/noise inject the training randomness (float t = i/N and
        epsilon) for golden-parity tests, mirroring loss_on_batch."""
        teacher_process = teacher_process or self
        sched = self._noise_scheduler
        assert sched.continuous(), "distillation requires a continuous scheduler"
        b = images.shape[0]
        context = dict(context)
        rng_t, rng_eps = jax.random.split(rng)

        x_0 = normalize_to_neg_one_to_one(images)
        if timesteps is not None:
            t = jnp.asarray(timesteps, jnp.float32)
        else:
            t = jax.random.randint(rng_t, (b,), 0, N).astype(jnp.float32) / N
        logsnr = sched.logsnr(t)
        context["logsnr_t"] = logsnr
        context["timestep"] = t

        epsilon = (
            jnp.asarray(noise)
            if noise is not None
            else jax.random.normal(rng_eps, x_0.shape)
        )
        z_t = sched.q_sample(x_start=x_0, t=t, noise=epsilon)

        def expand(v):
            return v.reshape((-1,) + (1,) * (z_t.ndim - 1))

        # Teacher DDIM step 1: t -> t - 0.5/N.
        teacher_v = jax.lax.stop_gradient(
            teacher_process.predict_score(teacher_params, z_t, context)
        )
        x_pred = sched.predict_x_from_v(z=z_t, v=teacher_v, context=context)
        eps_pred = sched.predict_epsilon_from_x(z=z_t, x=x_pred, context=context)

        u_mid = t - 0.5 / N
        logsnr_mid = sched.logsnr(u_mid)
        a_mid = expand(jnp.sqrt(jax.nn.sigmoid(logsnr_mid)))
        stdv_mid = expand(jnp.sqrt(jax.nn.sigmoid(-logsnr_mid)))
        z_mid = a_mid * x_pred + stdv_mid * eps_pred

        # Teacher DDIM step 2: t - 0.5/N -> t - 1/N.
        ctx_mid = dict(context)
        ctx_mid["logsnr_t"] = logsnr_mid
        ctx_mid["timestep"] = u_mid
        teacher_v2 = jax.lax.stop_gradient(
            teacher_process.predict_score(teacher_params, z_mid, ctx_mid)
        )
        x_pred = sched.predict_x_from_v(z=z_t, v=teacher_v2, context=context)
        eps_pred = sched.predict_epsilon_from_x(z=z_t, x=x_pred, context=context)

        u_s = t - 1.0 / N
        logsnr_s = sched.logsnr(u_s)
        a_s = expand(jnp.sqrt(jax.nn.sigmoid(logsnr_s)))
        stdv_s = expand(jnp.sqrt(jax.nn.sigmoid(-logsnr_s)))
        z_teacher = a_s * x_pred + stdv_s * eps_pred

        # x-target implied by z_teacher (!= x_pred).
        a_t = expand(jnp.sqrt(jax.nn.sigmoid(logsnr)))
        stdv_frac = expand(
            jnp.exp(
                0.5 * (jax.nn.softplus(logsnr) - jax.nn.softplus(logsnr_s))
            )
        )
        x_target = (z_teacher - stdv_frac * z_t) / (a_s - stdv_frac * a_t)
        x_target = jnp.where(expand(t == 0), x_pred, x_target)
        eps_target = sched.predict_epsilon_from_x(
            z=z_t, x=x_target, context=context
        )

        # Student one-step prediction; SNR weighting => epsilon MSE.
        model_v = self.predict_score(params, z_t, context)
        model_x = sched.predict_x_from_v(z=z_t, v=model_v, context=context)
        model_eps = sched.predict_epsilon_from_x(
            z=z_t, x=model_x, context=context
        )
        loss_per = mean_flat((model_eps - eps_target) ** 2)
        loss = loss_per.mean()
        return loss, {
            "loss": loss,
            "mse_loss": loss,
            "vb_loss": jnp.zeros(()),
            "timesteps": t,
            "loss_per_example": jax.lax.stop_gradient(loss_per),
        }

    def _vb_bits_per_dim(
        self, epsilon_v_param, x_0, x_t, context: Dict, clip_denoised: bool
    ) -> jax.Array:
        """Variational-bound term in bits/dim for learned-sigma models
        (reference ddpm.py:989-1046)."""
        model_prediction, learned_variance = epsilon_v_param
        sched = self._noise_scheduler

        true_mean, _, true_log_var = sched.q_posterior(
            x_start=x_0, x_t=x_t, context=context
        )
        if self._prediction_type == PredictionType.EPSILON:
            x_hat = sched.predict_x_from_epsilon(
                z=x_t, epsilon=model_prediction, context=context
            )
        else:
            x_hat = sched.predict_x_from_v(
                z=x_t, v=model_prediction, context=context
            )
        if clip_denoised:
            x_hat = jnp.clip(x_hat, -1.0, 1.0)
        model_mean, _, _ = sched.q_posterior(x_start=x_hat, x_t=x_t, context=context)
        model_log_var = learned_variance

        kl = normal_kl(true_mean, true_log_var, model_mean, model_log_var)
        kl = mean_flat(kl) / jnp.log(2.0)

        decoder_nll = -discretized_gaussian_log_likelihood(
            x_0, means=model_mean, log_scales=0.5 * model_log_var
        )
        decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)

        # At t == 0 use the decoder NLL, else the KL.
        t = context["timestep"]
        is_t0 = (t == 0) if t.dtype in (jnp.int32, jnp.int64) else (t < 1e-8)
        return jnp.where(is_t0, decoder_nll, kl)

    # -- sampling -------------------------------------------------------------

    def sampling_shape(self, num_samples: int) -> Tuple[int, ...]:
        sampling = self._config.diffusion.sampling
        s = sampling.output_spatial_size
        spatial = [s[0], s[1]] if isinstance(s, list) else [s, s]
        if "output_frames" in sampling:
            return (
                num_samples,
                sampling.output_frames,
                spatial[0],
                spatial[1],
                sampling.output_channels,
            )
        return (num_samples, spatial[0], spatial[1], sampling.output_channels)

    def _cached_sample_fn(
        self, num_samples, num_steps, cfg, sampler_key
    ) -> Callable:
        # Per-instance cache: an lru_cache on the method would be
        # class-global, so one instance's cache_clear() (e.g. a cascade
        # stage updating its latent scale) would wipe every instance's
        # compiled sample programs and pin `self` in the cache.
        key = (num_samples, num_steps, cfg, sampler_key)
        cached = self._sample_fn_cache.get(key)
        if cached is not None:
            return cached
        fn = self._build_sample_fn(num_samples, num_steps, cfg, sampler_key)
        if len(self._sample_fn_cache) >= 16:
            self._sample_fn_cache.pop(next(iter(self._sample_fn_cache)))
        self._sample_fn_cache[key] = fn
        return fn

    def _build_sample_fn(
        self, num_samples, num_steps, cfg, sampler_key
    ) -> Callable:
        sampler = (
            self._extra_samplers[sampler_key]
            if sampler_key is not None
            else self._reverse_process_sampler
        )
        shape = self.sampling_shape(num_samples)
        fn = build_sample_loop(
            process=self,
            shape=shape,
            num_sampling_steps=num_steps,
            sampler=sampler,
            classifier_free_guidance=cfg,
            unnormalize=self._latent_encoder is None,
        )
        if self._latent_encoder is None:
            return jax.jit(fn)

        le = self._latent_encoder
        le_params = self._latent_encoder_params
        scale = self._latent_scale_factor

        def fn_with_decode(params, rng, context, uncond, initial_noise):
            latents = fn(params, rng, context, uncond, initial_noise)
            decoded = le.decode_from_latents(le_params, latents / scale)
            from xdiffusion_tpu.utils import unnormalize_to_zero_to_one

            return unnormalize_to_zero_to_one(decoded)

        return jax.jit(fn_with_decode)

    def sample(
        self,
        params,
        rng: jax.Array,
        num_samples: int = 16,
        context: Optional[Dict] = None,
        classifier_free_guidance: Optional[float] = None,
        num_sampling_steps: Optional[int] = None,
        sampler=None,
        initial_noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Generate samples; the full reverse process is one jitted scan.

        Host-side context preprocessing happens here (string prompts ->
        arrays); everything after is on-device.
        """
        context = dict(context or {})
        # Cascade stages with fixed sampling-time conditioning augmentation
        # (reference ddpm.py:612-618).
        if "super_resolution" in self._config:
            sr = self._config.super_resolution
            if "sampling_augmentation_level" in sr:
                context["augmentation_level"] = sr.sampling_augmentation_level
        steps = (
            num_sampling_steps
            if num_sampling_steps is not None
            else self._noise_scheduler.steps()
        )

        unconditional_context = None
        if classifier_free_guidance is not None:
            unconditional_context = self.unconditional_context(context)
            if unconditional_context is not None:
                unconditional_context = self.preprocess_context(
                    unconditional_context
                )
        context = self.preprocess_context(context)

        # Strip any unresolved host-only signals (prompt strings survive
        # when several embedders each consume them without popping).
        def sanitize(ctx):
            if ctx is None:
                return None
            return {
                k: v
                for k, v in ctx.items()
                if not isinstance(v, (str, list, tuple)) or k == "shape"
            }

        context = sanitize(context)
        unconditional_context = sanitize(unconditional_context)

        sampler_key = None
        if sampler is not None:
            sampler_key = (type(sampler).__module__, type(sampler).__name__)
            self._extra_samplers[sampler_key] = sampler
        sample_fn = self._cached_sample_fn(
            num_samples, steps, classifier_free_guidance, sampler_key
        )
        return sample_fn(
            params, rng, context, unconditional_context, initial_noise
        )
