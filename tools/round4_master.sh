#!/bin/bash
# Round-4 chip-job queue: the one real chip serializes everything, so
# run the short transcriber training first (its checkpoint lights up
# the F1 columns in every sweep cell), then hand the chip to the
# base-scale de-proxying sweep (tools/round4_base_sweep.sh).
set -u
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

TRANSCRIBER=${TRANSCRIBER:-/tmp/transcriber}
TR_STEPS=${TR_STEPS:-2000}

tr_latest() {
  ls -d "$TRANSCRIBER"/step_* 2>/dev/null | sed 's/.*step_//' | sort -n | tail -1
}

for i in 1 2 3; do
  latest=$(tr_latest)
  if [ -n "${latest:-}" ] && [ "$latest" -ge "$TR_STEPS" ]; then break; fi
  echo "=== transcriber attempt $i (have step ${latest:-0}) ==="
  timeout 2700 python -m music_spectrogram_diffusion_tpu.cli.train_transcriber \
    --model_dir "$TRANSCRIBER" --steps "$TR_STEPS" --batch 32 \
    --synthetic_examples 256 --data_cache /tmp/transcriber_data.npz
  sleep 5
done
[ "$(tr_latest)" -ge "$TR_STEPS" ] || echo "WARNING: transcriber incomplete; sweep runs without F1"

exec bash /root/repo/tools/round4_base_sweep.sh
