#!/usr/bin/env bash
# Provision a Cloud TPU VM and launch xdiffusion_tpu training on it.
#
# TPU-native counterpart of the reference's tools/terraform (Lambda Labs
# GPU box + torchrun): instead of a GPU VM + NCCL, we create a TPU VM
# (optionally a multi-host pod slice) and run the training CLI once per
# host — JAX's jax.distributed.initialize() discovers the slice topology
# from the TPU runtime, and the Mesh in xdiffusion_tpu/parallel handles
# DP/FSDP over ICI.
#
# Usage:
#   tools/tpu/launch_tpu_vm.sh \
#     --name xdiff-v5e-8 --zone us-west4-a --type v5litepod-8 \
#     --config configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml \
#     --steps 100000 --batch 1024
#
# Requirements: gcloud CLI authenticated with TPU quota in the project.
set -euo pipefail

NAME="xdiffusion-tpu"
ZONE="us-west4-a"
TYPE="v5litepod-8"          # one host; use v5litepod-256 etc. for pods
VERSION="tpu-ubuntu2204-base"
CONFIG="configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml"
STEPS=10000
BATCH=1024
REPO_URL="${XDIFFUSION_REPO_URL:-}"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --name) NAME="$2"; shift 2 ;;
    --zone) ZONE="$2"; shift 2 ;;
    --type) TYPE="$2"; shift 2 ;;
    --config) CONFIG="$2"; shift 2 ;;
    --steps) STEPS="$2"; shift 2 ;;
    --batch) BATCH="$2"; shift 2 ;;
    --repo) REPO_URL="$2"; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

echo ">> creating TPU VM ${NAME} (${TYPE}) in ${ZONE}"
gcloud compute tpus tpu-vm create "${NAME}" \
  --zone="${ZONE}" \
  --accelerator-type="${TYPE}" \
  --version="${VERSION}"

# --worker=all runs the same command on every host of a pod slice; JAX
# coordinates the hosts through the TPU runtime (no torchrun, no NCCL).
RUN_CMD=$(cat <<CMD
set -e
if [ ! -d xdiffusion_tpu_repo ]; then
  git clone ${REPO_URL:-<set XDIFFUSION_REPO_URL>} xdiffusion_tpu_repo
fi
cd xdiffusion_tpu_repo
pip install -q -U "jax[tpu]" flax optax orbax-checkpoint einops pyyaml pillow
export JAX_COMPILATION_CACHE_DIR=\$HOME/.cache/jax
python training/image/train.py \
  --config_path ${CONFIG} \
  --num_training_steps ${STEPS} \
  --batch_size ${BATCH} \
  --output_path gs_or_local_output
CMD
)

echo ">> launching training on all hosts"
gcloud compute tpus tpu-vm ssh "${NAME}" --zone="${ZONE}" --worker=all \
  --command="${RUN_CMD}"

echo ">> done. Delete with:"
echo "   gcloud compute tpus tpu-vm delete ${NAME} --zone=${ZONE}"
