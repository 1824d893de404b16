#!/bin/bash
# Reproduce the round-3 quality loop end-to-end on one TPU chip:
#   1. train the context_small teacher on the synthetic task (10k steps),
#   2. evaluate sampler families / step counts / guidance intervals on
#      8 held-out synthetic songs (seed 1000, disjoint from training).
#
# Results land in $OUT (default /tmp/eval_sweep); the BENCH.md round-3
# quality table is produced from these JSONs. Training restarts itself
# every ~45 min to dodge the tunnel-client host-RSS leak (BENCH.md
# round-3 practical notes); resume is automatic from the latest
# checkpoint in $MODEL_DIR.
set -u
MODEL_DIR=${MODEL_DIR:-/tmp/teacher_small}
OUT=${OUT:-/tmp/eval_sweep}
TARGET=${TARGET:-10000}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p "$JAX_COMPILATION_CACHE_DIR" "$OUT"

latest_step() {
  ls -d "$MODEL_DIR"/step_* 2>/dev/null | sed 's/.*step_//' | sort -n | tail -1
}

for i in $(seq 1 40); do
  latest=$(latest_step)
  if [ -n "${latest:-}" ] && [ "$latest" -ge "$TARGET" ]; then break; fi
  echo "=== train attempt $i (resuming from step ${latest:-0}) ==="
  timeout 2700 python -m music_spectrogram_diffusion_tpu.cli.train \
    --preset context_small --model_dir "$MODEL_DIR" --synthetic \
    --synthetic_examples 256 --steps "$TARGET" --batch 16 \
    --checkpoint_period 500 --cache_root /tmp/cache_synth
  sleep 5
done
[ "$(latest_step)" -ge "$TARGET" ] || { echo "training did not finish"; exit 1; }

run_eval() {  # tag [extra evaluate args...]
  tag=$1; shift
  # --vocode renders audio (Griffin-Lim): the population-FAD metric
  # computes embeddings from rendered audio, so without it the sweep
  # would silently drop its headline metric.
  python -m music_spectrogram_diffusion_tpu.cli.evaluate \
    --checkpoint "$MODEL_DIR" --synthetic --seed 1000 --songs 8 \
    --vocode --output_dir "$OUT/$tag" "$@"
  echo "=== done $tag ==="
}

# Anchors (the round-3 table's DDPM rows).
run_eval teacher_ddpm1000 --sampler ddpm --steps 1000
run_eval teacher_ddpm250  --sampler ddpm --steps 250
# Stochastic second-order at aggressive step counts.
run_eval teacher_sdedpm250 --sampler sde-dpm++ --steps 250
run_eval teacher_sdedpm100 --sampler sde-dpm++ --steps 100
run_eval teacher_sdedpm64  --sampler sde-dpm++ --steps 64
run_eval teacher_sdedpm32  --sampler sde-dpm++ --steps 32
# Deterministic second-order (expected at the ODE ceiling).
run_eval teacher_dpm64 --sampler dpm++ --steps 64
# Guidance interval (CFG only at mid noise levels).
run_eval teacher_ddpm1000_iv18  --sampler ddpm      --steps 1000 --guidance_interval 0.1,0.8
run_eval teacher_ddpm250_iv18   --sampler ddpm      --steps 250 --guidance_interval 0.1,0.8
run_eval teacher_sdedpm100_iv18 --sampler sde-dpm++ --steps 100 --guidance_interval 0.1,0.8
run_eval teacher_sdedpm64_iv18  --sampler sde-dpm++ --steps 64  --guidance_interval 0.1,0.8
echo "SWEEP DONE"
