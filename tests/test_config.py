"""Config runtime tests: DotConfig semantics + reflective instantiation,
including resolution of reference-style `xdiffusion.*` / `torch.*` targets."""

import textwrap

from xdiffusion_tpu import config as cfg
from xdiffusion_tpu.context import Identity
from xdiffusion_tpu.scheduler import DiscreteNoiseScheduler


def test_dotconfig_access():
    c = cfg.DotConfig({"a": {"b": 3}, "flag": True})
    assert c.a.b == 3
    assert c["a"]["b"] == 3
    assert "a" in c
    assert "missing" not in c
    assert c.to_dict()["flag"] is True


def test_load_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        textwrap.dedent(
            """
            diffusion:
              parameterization: "epsilon"
              noise_scheduler:
                target: xdiffusion.scheduler.DiscreteNoiseScheduler
                params:
                  num_scales: 100
                  schedule_type: "linear"
                  loss_type: "l2"
            """
        )
    )
    c = cfg.load_yaml(str(p))
    assert c.diffusion.parameterization == "epsilon"
    sched = cfg.instantiate_from_config(c.diffusion.noise_scheduler)
    assert isinstance(sched, DiscreteNoiseScheduler)
    assert sched.steps() == 100


def test_reference_target_resolution():
    # Reference configs name xdiffusion.* and torch.* targets; both must
    # resolve onto this package (byte-compatible YAML requirement).
    obj = cfg.instantiate_from_config({"target": "torch.nn.Identity", "params": {}})
    assert isinstance(obj, Identity)
    assert obj("x") == "x"

    sched = cfg.instantiate_from_config(
        {
            "target": "xdiffusion.scheduler.DiscreteNoiseScheduler",
            "params": {
                "num_scales": 100,
                "schedule_type": "cosine",
                "loss_type": "l2",
                "importance_sampler": {
                    "target": "xdiffusion.importance_sampling.UniformSampler",
                    "params": {"num_timesteps": 100},
                },
            },
        }
    )
    assert sched.steps() == 100


def test_instantiate_partial():
    ctor = cfg.instantiate_partial_from_config(
        {"target": "xdiffusion_tpu.context.UnconditionalClassesAdapter", "params": {}}
    )
    adapter = ctor(num_classes=10)
    import jax.numpy as jnp

    out = adapter({"classes": jnp.zeros((4,), dtype=jnp.int32)})
    assert int(out["classes"][0]) == 10
