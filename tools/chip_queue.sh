#!/bin/bash
# THE single chip-job queue (replaces round4_master{,2,3}.sh — VERDICT
# round-4 "Next round" #2: chip hygiene as a mechanism, not discipline).
#
#   bash tools/chip_queue.sh &            # run the round-5 sequence
#   touch /tmp/msd_quiesce                # wind down cleanly: the queue
#                                         # exits at the next job/chunk
#                                         # boundary (<= ~45 min)
#
# Invariants:
#  * writes /tmp/chip_queue.pid; bench.py's contention guard reports any
#    live queue (or other framework process) in its JSON output.
#  * checks the quiesce sentinel between every chip job AND between
#    training chunks, so "stop before the driver snapshot" is one touch.
#  * one TARGET env is the single source of truth for the teacher step
#    count (round 4 had 8000 vs 10000 in two scripts; the teacher of
#    record stopped at 8000 — recipe-consistent per round-3's 9k==10k
#    eval equivalence measurement).
#  * every payload is skip-if-done, so the queue is idempotent: rerun it
#    after any interruption and it resumes where it left off.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10

QUIESCE=/tmp/msd_quiesce
PIDFILE=/tmp/chip_queue.pid
MODEL_DIR=${MODEL_DIR:-/tmp/teacher_base}
TARGET=${TARGET:-8000}
OUT=${OUT:-/root/repo/results/round5/base_sweep}
SONGS=${SONGS:-16}
TRANSCRIBER=${TRANSCRIBER:-/tmp/transcriber_big}
TR_STEPS=${TR_STEPS:-4000}
TR_DATA=${TR_DATA:-/tmp/transcriber_data_big.npz}
GAN_DIR=${GAN_DIR:-/tmp/gan_voc}

echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT
mkdir -p "$JAX_COMPILATION_CACHE_DIR" "$OUT"

quiesce_check() {
  if [ -e "$QUIESCE" ]; then
    echo "=== quiesce sentinel present; queue exiting cleanly ==="
    exit 0
  fi
}

# Optional: wait for a foreign in-flight chip job (by PID) to drain
# before taking the chip.
if [ -n "${WAIT_PID:-}" ]; then
  echo "=== waiting for pid $WAIT_PID to release the chip ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

latest_step() {  # committed checkpoints only (mid-save kills leave no 'state')
  local dir=$1
  for d in "$dir"/step_*; do
    if [ -e "$d/state" ] || [ -e "$d/METADATA" ]; then
      echo "${d##*step_}"
    fi
  done 2>/dev/null | sort -n | tail -1
}

train_chunked() {  # dir target max_attempts cmd...
  local dir=$1 target=$2 attempts=$3; shift 3
  for i in $(seq 1 "$attempts"); do
    quiesce_check
    local latest; latest=$(latest_step "$dir")
    if [ -n "${latest:-}" ] && [ "$latest" -ge "$target" ]; then return 0; fi
    echo "=== $dir attempt $i (resuming from step ${latest:-0}) ==="
    timeout 2700 "$@"
    sleep 5
  done
  local latest; latest=$(latest_step "$dir")
  [ -n "${latest:-}" ] && [ "$latest" -ge "$target" ]
}

# ---------------------------------------------------------------- jobs --

job_teacher() {
  train_chunked "$MODEL_DIR" "$TARGET" 40 \
    python -m music_spectrogram_diffusion_tpu.cli.train \
      --preset context_base --model_dir "$MODEL_DIR" --synthetic \
      --synthetic_examples 256 --steps "$TARGET" --batch 16 --remat \
      --checkpoint_period 500 --cache_root /tmp/cache_synth \
    || { echo "FATAL: teacher did not reach $TARGET"; exit 1; }
}

job_transcriber() {
  # The validated recipe: >=4096 songs (16384 segments in $TR_DATA).
  # cli/train_transcriber resumes from the latest checkpoint now.
  [ -f "$TR_DATA" ] || { echo "no $TR_DATA; skipping transcriber"; return; }
  train_chunked "$TRANSCRIBER" "$TR_STEPS" 6 \
    python -m music_spectrogram_diffusion_tpu.cli.train_transcriber \
      --model_dir "$TRANSCRIBER" --steps "$TR_STEPS" --batch 32 \
      --data_cache "$TR_DATA" \
    || echo "WARN: transcriber did not reach $TR_STEPS"
  # Near-random reference weights for the F1 sanity floor (1 step).
  if ! ls /tmp/transcriber_rand/step_* >/dev/null 2>&1; then
    quiesce_check
    timeout 900 python -m music_spectrogram_diffusion_tpu.cli.train_transcriber \
      --model_dir /tmp/transcriber_rand --steps 1 --batch 8 \
      --checkpoint_period 1 --data_cache "$TR_DATA"
  fi
}

TR_FLAGS=()
arm_transcriber() {
  if ls "$TRANSCRIBER"/step_* >/dev/null 2>&1; then
    TR_FLAGS=(--transcriber_checkpoint "$TRANSCRIBER")
  fi
}

run_eval() {  # tag seed [extra evaluate args...]
  local tag=$1 seed=$2; shift 2
  for attempt in 1 2; do
    quiesce_check
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

job_f1_sanity() {
  # VERDICT #3: trained transcriber on gt_raw audio => high F1;
  # near-random weights on the same audio => ~0. Only then cite cell F1.
  arm_transcriber
  run_eval "gt_raw"     1000 --prediction_source gt_raw
  run_eval "gt_encoded" 1000 --prediction_source gt_encoded
  if ls /tmp/transcriber_rand/step_* >/dev/null 2>&1; then
    local saved=("${TR_FLAGS[@]}")
    TR_FLAGS=(--transcriber_checkpoint /tmp/transcriber_rand)
    run_eval "gt_raw_tr_random" 1000 --prediction_source gt_raw
    TR_FLAGS=("${saved[@]}")
  fi
}

job_sweep() {
  arm_transcriber
  for seed in 1000 2000; do
    local sfx=""; [ "$seed" = 2000 ] && sfx="_seed2000"
    run_eval "ddpm1000$sfx"        "$seed" --sampler ddpm --steps 1000
    run_eval "ddpm1000_iv18$sfx"   "$seed" --sampler ddpm --steps 1000 --guidance_interval 0.1,0.8
    run_eval "sdedpm100_iv18$sfx"  "$seed" --sampler sde-dpm++ --steps 100 --guidance_interval 0.1,0.8
    run_eval "sdedpm64_iv18$sfx"   "$seed" --sampler sde-dpm++ --steps 64 --guidance_interval 0.1,0.8
  done
}

job_sharded_merge_proof() {
  # VERDICT #6: run one real-model eval as 2 shards + merge_eval, and
  # keep the single-process sdedpm64 cell for an exactness cross-check.
  arm_transcriber
  local dir="$OUT/sdedpm64_iv18_sharded"
  if [ -f "$dir/metrics.json" ]; then echo "=== skip sharded proof (done)"; return; fi
  for shard in 0 1; do
    quiesce_check
    [ -f "$dir/shard$shard/metrics.json" ] && continue
    timeout 2700 python -m music_spectrogram_diffusion_tpu.cli.evaluate \
      --checkpoint "$MODEL_DIR" --synthetic --seed 1000 --songs "$SONGS" \
      --songs_per_batch 4 --vocode --sampler sde-dpm++ --steps 64 \
      --guidance_interval 0.1,0.8 --num_shards 2 --shard "$shard" \
      --output_dir "$dir/shard$shard" "${TR_FLAGS[@]}"
  done
  quiesce_check
  python -m music_spectrogram_diffusion_tpu.cli.merge_eval \
    --shards "$dir/shard0" "$dir/shard1" --output "$dir"
}

job_gan_vocoder() {
  # Budget guard: the GAN is the lowest-priority payload (VERDICT #4 —
  # "with remaining chip time only"), so its training is bounded by a
  # wall-clock deadline (GAN_DEADLINE, epoch secs) instead of a step
  # count: chunks stop when the deadline nears, and the A/B eval always
  # runs on whatever checkpoint exists so the round ends with a
  # committed eval_vocoder_gan*.json either way.
  quiesce_check
  RECON_STEPS=${RECON_STEPS:-6000}
  ADV_STEPS=${ADV_STEPS:-16000}
  GAN_DEADLINE=${GAN_DEADLINE:-0}

  gan_time_left() {
    if [ "$GAN_DEADLINE" -gt 0 ]; then
      echo $(( GAN_DEADLINE - $(date +%s) ))
    else
      echo 99999
    fi
  }

  gan_chunked() {  # target [extra train_vocoder flags...]
    local target=$1; shift
    for i in $(seq 1 20); do
      quiesce_check
      local left; left=$(gan_time_left)
      if [ "$left" -lt 600 ]; then
        echo "=== GAN deadline reached (left=${left}s) ==="; return 1
      fi
      local latest; latest=$(latest_step "$GAN_DIR")
      if [ -n "${latest:-}" ] && [ "$latest" -ge "$target" ]; then return 0; fi
      local t=$(( left - 300 )); [ "$t" -gt 2700 ] && t=2700
      echo "=== GAN chunk (step ${latest:-0}/$target, timeout ${t}s) ==="
      timeout "$t" python -m music_spectrogram_diffusion_tpu.cli.train_vocoder \
        --model_dir "$GAN_DIR" --synthetic --arch soundstream \
        --steps "$target" --batch 16 --waveform_weight 0 \
        --checkpoint_period 500 --log_period 200 --resume "$@"
      sleep 5
    done
    return 1
  }

  gan_eval() {  # output_json
    quiesce_check
    ls "$GAN_DIR"/step_* >/dev/null 2>&1 || { echo "no GAN ckpt; skip eval"; return; }
    [ -f "$1" ] && { echo "=== skip $(basename "$1") (done)"; return; }
    timeout 1800 python -m music_spectrogram_diffusion_tpu.cli.eval_vocoder \
      --checkpoint "$GAN_DIR" --synthetic --clips 16 --seed 1000 \
      --output "$1"
  }

  local recon_done=0
  gan_chunked "$RECON_STEPS" && recon_done=1 \
    || echo "WARN: GAN recon phase incomplete"
  # A/B the recon-only decoder first, so a diverging adversarial phase
  # can't leave the round with zero GAN artifacts.
  gan_eval /root/repo/results/round5/eval_vocoder_gan_recon.json
  if [ "$recon_done" = 1 ]; then
    gan_chunked "$ADV_STEPS" --adversarial \
      || echo "WARN: GAN adversarial phase incomplete"
    gan_eval /root/repo/results/round5/eval_vocoder_gan.json
  fi
}

job_rescore() {
  # VERDICT #3: after extending the transcriber, recompute every cell's
  # F1 columns from the saved prediction WAVs (the expensive diffusion
  # sampling is NOT redone). Seed groups must match each cell's source
  # seed (the synthetic songs themselves key on it). gt_raw_tr_random is
  # excluded (its weights are the point); the sharded dirs are excluded
  # (they are the merge-proof, not F1 cells).
  ls "$TRANSCRIBER"/step_* >/dev/null 2>&1 || { echo "no transcriber; skip rescore"; return; }
  local s1000=() s2000=()
  local d
  for d in "$OUT"/*/; do
    d=${d%/}
    [ -f "$d/metrics.json" ] || continue
    case "$(basename "$d")" in
      *tr_random*|*sharded*|*_rich*) continue;;
      *seed2000*) s2000+=("$d");;
      *) s1000+=("$d");;
    esac
  done
  quiesce_check
  [ ${#s1000[@]} -gt 0 ] && timeout 3600 python tools/rescore_f1.py \
      --transcriber_checkpoint "$TRANSCRIBER" --songs "$SONGS" \
      --seed 1000 "${s1000[@]}"
  quiesce_check
  [ ${#s2000[@]} -gt 0 ] && timeout 3600 python tools/rescore_f1.py \
      --transcriber_checkpoint "$TRANSCRIBER" --songs "$SONGS" \
      --seed 2000 "${s2000[@]}"
}

job_rich_pair() {
  # VERDICT round-4 #7: protocol-ordering stability on the rich-timbre
  # render. Same seeded note streams as the committed sine cells; the
  # FAD target is the rich ground truth of the same songs. FAD-only:
  # the transcriber is sine-trained, so F1 on rich audio would be
  # meaningless and transcription is skipped.
  TR_FLAGS=()
  run_eval "gt_encoded_rich"     1000 --prediction_source gt_encoded --synthetic_timbre rich
  run_eval "ddpm1000_iv18_rich"  1000 --sampler ddpm --steps 1000 --guidance_interval 0.1,0.8 --synthetic_timbre rich
  run_eval "sdedpm100_iv18_rich" 1000 --sampler sde-dpm++ --steps 100 --guidance_interval 0.1,0.8 --synthetic_timbre rich
}

# ------------------------------------------------------------- sequence --
JOBS=${JOBS:-"teacher transcriber f1_sanity sweep sharded_merge_proof rescore rich_pair gan_vocoder"}
for job in $JOBS; do
  quiesce_check
  echo "=== JOB $job ==="
  "job_$job"
done
echo "QUEUE DONE"
