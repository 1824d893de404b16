#!/bin/bash
# Round-4 chip queue, take 3: same as take 2 but the teacher stops at
# 8k steps (round 3 measured 9k vs 10k evals statistically identical;
# the LR schedule is warmup-constant so an early stop is
# recipe-consistent) to protect wall-clock for the eval cells.
set -u
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
MODEL_DIR=${MODEL_DIR:-/tmp/teacher_base}
TARGET=${TARGET:-8000}
TRANSCRIBER=${TRANSCRIBER:-/tmp/transcriber}
TR_STEPS=${TR_STEPS:-4000}

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

latest_step() {
  for d in "$MODEL_DIR"/step_*; do
    if [ -e "$d/state" ] || [ -e "$d/METADATA" ]; then
      echo "${d##*step_}"
    fi
  done 2>/dev/null | sort -n | tail -1
}

for i in $(seq 1 40); do
  latest=$(latest_step)
  if [ -n "${latest:-}" ] && [ "$latest" -ge "$TARGET" ]; then break; fi
  echo "=== teacher attempt $i (resuming from step ${latest:-0}) ==="
  timeout 1800 python -m music_spectrogram_diffusion_tpu.cli.train \
    --preset context_base --model_dir "$MODEL_DIR" --synthetic \
    --synthetic_examples 256 --steps "$TARGET" --batch 16 --remat \
    --checkpoint_period 1000 --cache_root /tmp/cache_synth
  sleep 5
done
[ "$(latest_step)" -ge "$TARGET" ] || { echo "teacher did not finish"; exit 1; }

if [ -f /tmp/transcriber_data_big.npz ]; then
  for i in 1 2 3; do
    latest=$(ls -d "$TRANSCRIBER"/step_* 2>/dev/null | sed 's/.*step_//' | sort -n | tail -1)
    if [ -n "${latest:-}" ] && [ "$latest" -ge "$TR_STEPS" ]; then break; fi
    echo "=== transcriber retrain attempt $i ==="
    timeout 2700 python -m music_spectrogram_diffusion_tpu.cli.train_transcriber \
      --model_dir "$TRANSCRIBER" --steps "$TR_STEPS" --batch 32 \
      --data_cache /tmp/transcriber_data_big.npz
    sleep 5
  done
fi

TARGET="$TARGET" exec bash /root/repo/tools/round4_base_sweep.sh
