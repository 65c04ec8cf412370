#!/bin/bash
# Round-4 stage 1: perf measurement sweeps (VERDICT r3 item 2).
# One jax process at a time (axon serializes compiles); logs under
# artifacts/r4_backlog/.  Stages split from tpu_backlog_r4.sh so the TPU
# frees up between stages for kernel-lever measurements.
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
run train_step_split_k16_mc96 1800 python tools/bench_train_step.py \
  --max_hits 16 --max_clusters 96 --cull_cluster 128 --split_far --mc_far 32

echo STAGE1_DONE | tee -a "$OUT/backlog.log"
