"""End-to-end tiny train -> checkpoint -> resume -> sample smoke test,
exercising the full CLI-level train() entry point."""

import os
import textwrap

import numpy as np


TINY_YAML = textwrap.dedent(
    """
    diffusion:
      parameterization: "epsilon"
      sampling:
        output_channels: 1
        output_spatial_size: 8
        target: xdiffusion_tpu.samplers.ancestral.AncestralSampler
        params: {}
      noise_scheduler:
        target: xdiffusion_tpu.scheduler.DiscreteNoiseScheduler
        params:
          num_scales: 8
          schedule_type: "cosine"
          loss_type: "l2"
      context_preprocessing:
        - target: xdiffusion_tpu.context.IgnoreContextAdapter
          params: {}
      input_preprocessing:
        target: xdiffusion_tpu.context.IgnoreInputPreprocessor
        params: {}
      classifier_free_guidance:
        classifier_free_guidance: 0.0
        unconditional_guidance_probability: 0.0
        signals: []
        unconditional_context:
          target: torch.nn.Identity
          params: {}
      score_network:
        target: xdiffusion_tpu.score_networks.unet.Unet
        params:
          input_channels: 1
          output_channels: 1
          input_spatial_size: 8
          num_features: 16
          channel_multipliers: [1, 2]
          num_resnet_blocks: 1
          use_scale_shift_norm: True
          resamp_with_conv: False
          resblock_updown: False
          resnet_block_type: "biggan"
          dropout: 0.0
          is_learned_sigma: False
          is_class_conditional: False
          num_classes: 10
          attention:
            attention_resolutions: [4]
            attention_heads: 2
            attention_channels: 16
            is_causal: False
          conditioning:
            signals: ["timestep"]
            projections:
              timestep:
                target: xdiffusion_tpu.layers.embedding.TimestepEmbeddingProjection
                params:
                  num_features: 16
                  time_embedding_mult: 4
            context_transformer_head:
              - target: xdiffusion_tpu.layers.embedding.RunProjection
                params:
                  input_context_key: "timestep"
                  output_context_key: "timestep_embedding"
                  projection_key: "timestep"
            context_transformer_layer:
              target: xdiffusion_tpu.layers.attention.SpatialCrossAttention
              params:
                context_dim: -1
                heads: 2
                dim_head: 8
                dropout: 0.0
    data:
      image_size: 8
      num_channels: 1
      num_classes: 10
    """
)


def test_train_checkpoint_resume_sample(tmp_path):
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    out_root = str(tmp_path / "out")

    from xdiffusion_tpu.training.image.train import train

    out_dir = train(
        config_path=str(cfg),
        num_training_steps=4,
        batch_size=16,
        dataset_name="image/mnist",
        output_path=out_root,
        save_and_sample_every_n=2,
        num_samples=4,
    )
    # Sample grids + metrics + checkpoints exist.
    assert os.path.exists(os.path.join(out_dir, "sample-2.png"))
    assert os.path.exists(os.path.join(out_dir, "sample-4.png"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    assert os.path.isdir(ckpt_dir)

    # Resume continues from the saved step.
    out_dir2 = train(
        config_path=str(cfg),
        num_training_steps=6,
        batch_size=16,
        dataset_name="image/mnist",
        output_path=out_root,
        save_and_sample_every_n=100,
        resume_from=ckpt_dir,
        num_samples=4,
    )
    metrics = open(os.path.join(out_dir2, "metrics.jsonl")).read().splitlines()
    assert len(metrics) >= 2
