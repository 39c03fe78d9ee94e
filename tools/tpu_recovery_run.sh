#!/bin/bash
# One-shot TPU perf/quality sequence for when the axon tunnel recovers.
# Runs, in order, appending JSON lines to tools/tpu_recovery_results.jsonl:
#   1. bench.py (headline + fused-resblock A/B)
#   2. train the flagship 10k steps @ batch 128
#   3. tools/measure_fid.py on the trained checkpoint (round-2 protocol)
#   4. tools/cross_stack_fid.py same-weights two-stack comparison
# Usage: nohup bash tools/tpu_recovery_run.sh > /tmp/tpu_recovery.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.cache/jax"
RESULTS=tools/tpu_recovery_results.jsonl
CFG=configs/image/mnist/ddpm_32x32_epsilon_discrete.yaml
CKPT_DIR=output/image_mnist/ddpm_32x32_epsilon_discrete

probe() {
  XDIFFUSION_BENCH_INIT_TIMEOUT=60 timeout 120 python - <<'EOF'
import threading, sys
box = {}
def go():
    import jax
    box["d"] = jax.devices()
t = threading.Thread(target=go, daemon=True)
t.start(); t.join(90)
sys.exit(0 if box.get("d") else 1)
EOF
}

echo "$(date -u +%FT%TZ) probing TPU..." >&2
if ! probe; then
  echo "$(date -u +%FT%TZ) TPU still unavailable; exiting" >&2
  exit 1
fi
echo "$(date -u +%FT%TZ) TPU up — starting sequence" >&2

{
  echo "{\"stage\": \"validate_fused_resblock\", \"ts\": \"$(date -u +%FT%TZ)\"}"
  timeout 1200 python tools/validate_fused_resblock_tpu.py
  echo "{\"stage\": \"bench\", \"ts\": \"$(date -u +%FT%TZ)\"}"
  timeout 1800 python bench.py
} >> "$RESULTS"

echo "$(date -u +%FT%TZ) training flagship 10k steps" >&2
timeout 3600 python training/image/train.py \
  --config_path "$CFG" --num_training_steps 10000 --batch_size 128 \
  --save_and_sample_every_n 5000 >&2

{
  echo "{\"stage\": \"measure_fid\", \"ts\": \"$(date -u +%FT%TZ)\"}"
  timeout 3600 python tools/measure_fid.py \
    --config_path "$CFG" --checkpoint "$CKPT_DIR" | tail -1
  echo "{\"stage\": \"cross_stack_fid\", \"ts\": \"$(date -u +%FT%TZ)\"}"
  timeout 7200 python tools/cross_stack_fid.py \
    --config_path "$CFG" --checkpoint "$CKPT_DIR" | tail -1
} >> "$RESULTS"

echo "$(date -u +%FT%TZ) sequence complete; results in $RESULTS" >&2
