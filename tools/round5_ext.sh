#!/bin/bash
# Round-5 extension queue: quality vs teacher-training-budget at 412M.
#
# The committed base sweep (results/round5/base_sweep/) measured every
# protocol on an 8k-step teacher and honestly concluded the absolute
# quality gap (FAD ~6200-6800 vs the 18.7 codec ceiling, cell F1 ~0) is
# a train-budget limitation, not a sampler one. This queue quantifies
# that claim: extend the same teacher to 11k steps (+37.5% budget) and
# re-run the headline cells pinned to step_11000, so BENCH.md can show
# the FAD-vs-budget slope instead of asserting it.
#
#   bash tools/round5_ext.sh &       # or setsid ... to survive the shell
#   touch /tmp/msd_quiesce           # clean wind-down at the next boundary
#
# Same invariants as tools/chip_queue.sh: pidfile for bench.py's
# contention guard, quiesce sentinel honored between every chunk/job,
# every payload skip-if-done (idempotent; rerun to resume).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10

QUIESCE=/tmp/msd_quiesce
PIDFILE=/tmp/chip_queue.pid
MODEL_DIR=${MODEL_DIR:-/tmp/teacher_base}
EXT_TARGET=${EXT_TARGET:-11000}
OUT=${OUT:-/root/repo/results/round5/base_sweep}
SONGS=${SONGS:-16}
TRANSCRIBER=${TRANSCRIBER:-/tmp/transcriber_big}

echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
mkdir -p "$JAX_COMPILATION_CACHE_DIR" "$OUT"

quiesce_check() {
  if [ -e "$QUIESCE" ]; then
    echo "=== quiesce sentinel present; ext queue exiting cleanly ==="
    exit 0
  fi
}

latest_step() {
  local dir=$1
  for d in "$dir"/step_*; do
    if [ -e "$d/state" ] || [ -e "$d/METADATA" ]; then
      echo "${d##*step_}"
    fi
  done 2>/dev/null | sort -n | tail -1
}

# ---- 1. extend the teacher to EXT_TARGET (30-min chunks, resume) ----
for i in 1 2 3 4 5 6; do
  quiesce_check
  latest=$(latest_step "$MODEL_DIR")
  if [ -n "${latest:-}" ] && [ "$latest" -ge "$EXT_TARGET" ]; then break; fi
  echo "=== teacher ext attempt $i (resuming from step ${latest:-0}) ==="
  timeout 1800 python -m music_spectrogram_diffusion_tpu.cli.train \
    --preset context_base --model_dir "$MODEL_DIR" --synthetic \
    --synthetic_examples 256 --steps "$EXT_TARGET" --batch 16 --remat \
    --checkpoint_period 500 --cache_root /tmp/cache_synth
  sleep 5
done
latest=$(latest_step "$MODEL_DIR")
if [ -z "${latest:-}" ] || [ "$latest" -lt "$EXT_TARGET" ]; then
  echo "FATAL: teacher did not reach $EXT_TARGET (at ${latest:-0})"
  exit 1
fi
CKPT="$MODEL_DIR/step_$EXT_TARGET"

TR_FLAGS=()
if ls "$TRANSCRIBER"/step_* >/dev/null 2>&1; then
  TR_FLAGS=(--transcriber_checkpoint "$TRANSCRIBER")
fi

run_eval() {  # tag seed [extra evaluate args...]
  local tag=$1 seed=$2; shift 2
  for attempt in 1 2; do
    quiesce_check
    if [ -f "$OUT/$tag/metrics.json" ]; then echo "=== skip $tag (done)"; return; fi
    echo "=== eval $tag attempt $attempt ==="
    timeout 2700 python -m music_spectrogram_diffusion_tpu.cli.evaluate \
      --checkpoint "$CKPT" --synthetic --seed "$seed" --songs "$SONGS" \
      --songs_per_batch 4 --vocode --output_dir "$OUT/$tag" \
      "${TR_FLAGS[@]}" "$@"
    sleep 5
  done
  [ -f "$OUT/$tag/metrics.json" ] && echo "=== done $tag ===" || echo "=== FAILED $tag ==="
}

# ---- 2. the budget-slope cells, highest value first ----
run_eval "sdedpm100_iv18_t11k" 1000 \
  --sampler sde-dpm++ --steps 100 --guidance_interval 0.1,0.8
run_eval "ddpm1000_iv18_t11k" 1000 \
  --sampler ddpm --steps 1000 --guidance_interval 0.1,0.8
run_eval "sdedpm100_iv18_t11k_seed2000" 2000 \
  --sampler sde-dpm++ --steps 100 --guidance_interval 0.1,0.8

echo "=== round5_ext queue complete ==="
