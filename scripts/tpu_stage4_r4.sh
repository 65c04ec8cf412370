#!/bin/bash
# Round-4 stage 4 TPU queue (serialized - axon queues compiles across
# processes).  Logs under artifacts/r4_backlog/.
#
#  1. scanq split-far sweep: find the starved~=0 honest config (VERDICT #2)
#  2. learned-KPN denoiser: datagen -> train -> eval grid (VERDICT #6)
#  3. parity rerun with resolution-scaled min_weight (VERDICT #4):
#     total_weight sums over rays, so at -r 256 the per-iteration weight is
#     (256/768)^2 = 1/9 of the reference's 768px protocol while the 0.1
#     threshold is absolute -> the default over-prunes ~9x (measured:
#     94.7k -> 16.4k at the first prune, diffuse decays after).
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r4_backlog
mkdir -p "$OUT"

run() {  # run NAME TIMEOUT CMD... - never abort the chain on one failure
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

run probe4 300 python -c "import jax; print(jax.devices())"
grep -q "probe4 rc=0" <(tail -1 "$OUT/backlog.log") || { echo TPU DOWN; exit 1; }

# 1. scanq split-far sweep (6-field cfg = split_far with that far budget)
run scanq_split 5400 python tools/bench_scan_mode.py --configs \
  "kbuffer:128:16:96:192,scanq:32:16:192:256:64,scanq:32:16:192:384:64,scanq:32:16:192:384:128,scanq:32:16:192:512:128"

# 2. learned denoiser: datagen (random cams; eval view held out) + train
run denoise_gen 5400 python tools/denoise_train.py --gen \
  --data /tmp/denoise_data.npz
run denoise_train 3600 python tools/denoise_train.py --train \
  --data /tmp/denoise_data.npz \
  --weights editable_gaussian_reflections_tpu/assets/denoise_kpn_v1.npz
run denoise_eval2 5400 python tools/denoiser_eval.py \
  --out "$OUT/denoiser_eval_kpn.json"

# 3. parity rerun, min_weight scaled to the 256px ray count
run parity_r4b 10800 env NO_WORKERS=1 python train.py \
  -s /tmp/parity_dataset -m /tmp/parity_r4b -r 256 --iterations 3000 \
  --no_bounces_until_iter 750 --min_weight 0.011 \
  --test_iterations 1 250 500 750 1000 1250 1500 2000 2500 3000 \
  --save_iterations 750 3000 --ray_tile 65536 --backend pallas
cp -r /tmp/parity_r4b "$OUT/../parity_r4b" 2>/dev/null || true

echo STAGE4_DONE | tee -a "$OUT/backlog.log"
