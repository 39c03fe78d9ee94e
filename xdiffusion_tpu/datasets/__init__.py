"""Host input pipeline.

Counterpart of the reference dataset registry
(/root/reference/xdiffusion/datasets/utils.py:8-91). Datasets are plain
in-memory numpy stores feeding device-resident batches; `load_dataset`
returns (dataset, convert_labels_to_prompts) like the reference.

Because this build environment has no network egress, loaders read real
archives when present (MNIST IDX / CIFAR-10 pickles under
$XDIFFUSION_DATA_DIR, default <repo>/data) and otherwise fall back to a
deterministic procedurally-generated stand-in with the same shapes,
classes, and label->prompt mapping, so training/benchmarks always run.
"""

from xdiffusion_tpu.datasets.utils import load_dataset  # noqa: F401
