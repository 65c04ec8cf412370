#!/bin/bash
# Round-4 TPU measurement backlog (the r3 backlog rebased to r4 paths).
# Run unattended while the tunnel is up; one jax process at a time (axon
# serializes compiles across processes); every step logs under
# artifacts/r4_backlog/.
#
# Steps:
#  1. render-kernel config sweeps (base / split-far / cluster=64 / tp64)
#  2. bench.py (adopts the sweep's best honest config via bench_best.json)
#  3. train-step configs incl. split-far
#  4. quality A/B: 1000 iters at parity defaults vs fast vs split-far
#  5. viewer FPS trace through the pipelined websocket service
#  6. eval_sweep at the A/B checkpoint with max_hits=16
#  7. xprof trace of the fused kernel
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r4_backlog
mkdir -p "$OUT"
# MODEL is produced by step 4's ab_default train (saves at iteration 1000);
# steps 5-6 check existence only when reached.
MODEL=${MODEL:-/tmp/ab_default}
DATASET=${DATASET:-/tmp/parity_dataset}

run() {  # run NAME TIMEOUT CMD... - never abort the chain on one failure
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

# 0. device probe - bail early if the TPU is down
run probe 300 python -c "import jax; print(jax.devices())"
grep -q "rc=0" <(tail -1 "$OUT/backlog.log") || { echo "TPU DOWN"; exit 1; }

# 0b. cross-backend kernel equality vs the committed CPU-interpret baseline
run hw_equality 1800 python tools/hw_equality.py \
  --out "$OUT/hw_eq_tpu.npz" --compare artifacts/hw_eq_cpu.npz

# 1. render sweep (honest starved-aware configs)
run render_sweep 3000 python tools/bench_render_sweep.py \
  --configs "96:192:256,96:192:128,96:160:64,96:256:128"

# 1b. split-far two-pass sweep
run render_sweep_split 3600 python tools/bench_render_sweep.py \
  --configs "64:64:256:256:s32,64:64:128:256:s32,64:96:128:256:s32,96:96:256:256:s48,96:128:128:256:s32,64:64:128:256:s32:k8"

# 1c. split-far at cluster=64
run render_sweep_split_c64 3600 python tools/bench_render_sweep.py \
  --cluster 64 --configs "96:96:256:256:s48,96:128:128:256:s48,128:128:128:256:s48"

# 1d. 8x8 PRIMARY pixel tiles (tile_p=64)
run render_sweep_tp64 3600 python tools/bench_render_sweep.py \
  --configs "96:192:256:64,64:64:128:64:s32,96:96:128:64:s48" \
  --rays_per_call 16384

# 2. bench.py (adopts artifacts/bench_best.json when the sweeps wrote one)
run bench 1800 python bench.py

# 3. train-step configs
run train_step_k16_mc128_c128 1800 python tools/bench_train_step.py \
  --max_hits 16 --max_clusters 128 --cull_cluster 128
run train_step_k16_mc192_c128 1800 python tools/bench_train_step.py \
  --max_hits 16 --max_clusters 192 --cull_cluster 128

# 3b. split-far train steps
run train_step_split_k16_mc96 1800 python tools/bench_train_step.py \
  --max_hits 16 --max_clusters 96 --cull_cluster 128 --split_far --mc_far 32
run train_step_split_k32_mc128 1800 python tools/bench_train_step.py \
  --max_hits 32 --max_clusters 128 --cull_cluster 128 --split_far --mc_far 32

# 4. quality A/B (1000 iters each, 256px parity dataset)
if [ -d "$DATASET" ]; then
  run ab_default 7200 env NO_WORKERS=1 python train.py -s "$DATASET" \
    -m /tmp/ab_default -r 256 --iterations 1000 --no_bounces_until_iter 750 \
    --test_iterations 1000 --save_iterations 1000 --backend pallas
  run ab_fast 7200 env NO_WORKERS=1 python train.py -s "$DATASET" \
    -m /tmp/ab_fast -r 256 --iterations 1000 --no_bounces_until_iter 750 \
    --test_iterations 1000 --save_iterations 1000 --backend pallas \
    --max_hits 16 --max_clusters 96
  run ab_split 7200 env NO_WORKERS=1 python train.py -s "$DATASET" \
    -m /tmp/ab_split -r 256 --iterations 1000 --no_bounces_until_iter 750 \
    --test_iterations 1000 --save_iterations 1000 --backend pallas \
    --max_hits 16 --max_clusters 96 --split_far --mc_far 32
  cp /tmp/ab_default/test_validation_scores.csv "$OUT/ab_default_scores.csv" || true
  cp /tmp/ab_fast/test_validation_scores.csv "$OUT/ab_fast_scores.csv" || true
  cp /tmp/ab_split/test_validation_scores.csv "$OUT/ab_split_scores.csv" || true
fi

# 5. viewer FPS trace (service in background, client drives 30 frames)
if [ -d "$MODEL" ]; then
  ( timeout 1200 python -m editable_gaussian_reflections_tpu.viewer.service \
      -m "$MODEL" -r 256 >"$OUT/service.log" 2>&1 & echo $! > /tmp/svc.pid )
  sleep 420  # compile
  run viewer_fps 600 python tools/viewer_client.py --frames 30 \
    --fps_json "$OUT/viewer_fps.json" --out /tmp/viewer_frames
  run viewer_fps_ellipsoid 600 python tools/viewer_client.py --frames 30 \
    --render_mode 5 --fps_json "$OUT/viewer_fps_ellipsoid.json" \
    --out /tmp/viewer_frames
  kill "$(cat /tmp/svc.pid)" 2>/dev/null
  # 6. eval_sweep at max_hits=16 (K-sensitivity at inference)
  run eval_sweep_k16 3600 python tools/eval_sweep.py -m "$MODEL" \
    --spp 1 16 --max_hits 16
  cp "$MODEL"/eval_sweep*.json "$OUT/" 2>/dev/null || true
fi

# 7. xprof trace of the fused kernel
run profile_kernel 1200 python tools/profile_kernel.py --trace_dir /tmp/xprof_fused
cp /tmp/xprof_fused.tar.gz "$OUT/" 2>/dev/null || true

echo DONE | tee -a "$OUT/backlog.log"
