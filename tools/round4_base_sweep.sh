#!/bin/bash
# Round-4 de-proxying sweep (VERDICT round-3 "Next round" #2): train the
# context_base (412M) teacher on the synthetic task with the SAME recipe
# as the round-3 context_small teacher (10k steps, batch 16, 256
# examples), then re-run the sampler sweep's four key cells on 16
# held-out songs x 2 seeds — checking whether the round-3 quality
# ordering (100-step SDE-DPM++ + guidance interval >= 1000-step DDPM)
# survives base scale. Eval JSONs carry the new bootstrap CIs.
#
# Training restarts itself every ~45 min to dodge the tunnel-client
# host-RSS leak (BENCH.md round-3 practical notes); resume is automatic.
set -u
MODEL_DIR=${MODEL_DIR:-/tmp/teacher_base}
OUT=${OUT:-/root/repo/results/round4/base_sweep}
TARGET=${TARGET:-10000}
SONGS=${SONGS:-16}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p "$JAX_COMPILATION_CACHE_DIR" "$OUT"

latest_step() {
  # Only count committed checkpoints (a kill mid-save leaves step_<N>/
  # without the orbax 'state' payload; train/checkpoints.py skips those
  # on resume too).
  for d in "$MODEL_DIR"/step_*; do
    if [ -e "$d/state" ] || [ -e "$d/METADATA" ]; then
      echo "${d##*step_}"
    fi
  done 2>/dev/null | sort -n | tail -1
}

for i in $(seq 1 40); do
  latest=$(latest_step)
  if [ -n "${latest:-}" ] && [ "$latest" -ge "$TARGET" ]; then break; fi
  echo "=== train attempt $i (resuming from step ${latest:-0}) ==="
  timeout 2700 python -m music_spectrogram_diffusion_tpu.cli.train \
    --preset context_base --model_dir "$MODEL_DIR" --synthetic \
    --synthetic_examples 256 --steps "$TARGET" --batch 16 --remat \
    --checkpoint_period 500 --cache_root /tmp/cache_synth
  sleep 5
done
[ "$(latest_step)" -ge "$TARGET" ] || { echo "training did not finish"; exit 1; }

TRANSCRIBER=${TRANSCRIBER:-/tmp/transcriber}
TR_FLAGS=()
if ls "$TRANSCRIBER"/step_* >/dev/null 2>&1; then
  # Light up note-onset F1 (VERDICT #3): the self-trained MT3
  # transcriber scores every cell's rendered audio.
  TR_FLAGS=(--transcriber_checkpoint "$TRANSCRIBER")
fi

run_eval() {  # tag seed [extra evaluate args...]
  tag=$1; seed=$2; shift 2
  # --vocode renders audio (Griffin-Lim w/ PGHI init): population FAD
  # computes embeddings from rendered audio. Two attempts per cell: the
  # first eval pays a large base-model compile and can hit the 45-min
  # timeout or a transient tunnel error; the retry then rides the
  # persistent compilation cache.
  for attempt in 1 2; do
    if [ -f "$OUT/$tag/metrics.json" ]; then echo "=== skip $tag (done)"; return; fi
    echo "=== eval $tag attempt $attempt ==="
    timeout 2700 python -m music_spectrogram_diffusion_tpu.cli.evaluate \
      --checkpoint "$MODEL_DIR" --synthetic --seed "$seed" --songs "$SONGS" \
      --songs_per_batch 4 --vocode --output_dir "$OUT/$tag" \
      "${TR_FLAGS[@]}" "$@"
    sleep 5
  done
  [ -f "$OUT/$tag/metrics.json" ] && echo "=== done $tag ===" || echo "=== FAILED $tag ==="
}

# F1 reference points (cheap — no diffusion sampling): ground-truth
# audio through the vocoder chain (gt_raw = transcriber ceiling) and
# the encode->decode roundtrip (gt_encoded = codec-limited ceiling).
run_eval "gt_raw"     1000 --prediction_source gt_raw
run_eval "gt_encoded" 1000 --prediction_source gt_encoded

for seed in 1000 2000; do
  sfx=""; [ "$seed" = 2000 ] && sfx="_seed2000"
  run_eval "ddpm1000$sfx"        "$seed" --sampler ddpm --steps 1000
  run_eval "ddpm1000_iv18$sfx"   "$seed" --sampler ddpm --steps 1000 --guidance_interval 0.1,0.8
  run_eval "sdedpm100_iv18$sfx"  "$seed" --sampler sde-dpm++ --steps 100 --guidance_interval 0.1,0.8
  run_eval "sdedpm64_iv18$sfx"   "$seed" --sampler sde-dpm++ --steps 64 --guidance_interval 0.1,0.8
done
echo "SWEEP DONE"
