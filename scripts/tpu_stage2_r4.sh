#!/bin/bash
# Round-4 stage 2: confirm the in-kernel matmul precision fix on hardware,
# re-sweep with the per-ray t_drop starved metric + throughput-cutoff arms,
# adopt the best honest config into bench, then the decisive diffuse-decay
# experiment: the r3 parity protocol re-run (to iteration 3000 with a dense
# eval cadence) on the FIXED kernels - r3 trained against gradients whose
# frame fields were bf16-truncated by the drain dots (hw_equality r4).
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r4_backlog
mkdir -p "$OUT"

# wait for stage 1 to release the TPU
while [ -e /proc/"$(cat /tmp/stage1.pid 2>/dev/null || echo 0)" ]; do
  sleep 30
done

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

run probe2 300 python -c "import jax; print(jax.devices())"
grep -q "rc=0" <(tail -1 "$OUT/backlog.log") || { echo "TPU DOWN"; exit 1; }

# 1. hardware equality with Precision.HIGHEST drain dots
run hw_equality_fixed 2400 python tools/hw_equality.py \
  --out "$OUT/hw_eq_tpu_fixed.npz" --compare artifacts/hw_eq_cpu.npz

# 2. sweeps under the per-ray starved metric (+ cutoff arms)
run sweep2_base 2400 python tools/bench_render_sweep.py \
  --configs "96:192:256,96:192:256:tc3"
run sweep2_split 3600 python tools/bench_render_sweep.py \
  --configs "64:64:128:256:s32,64:96:128:256:s48,64:64:128:256:s32:tc3,64:64:64:256:s32:tc3"
run sweep2_split_c64 3600 python tools/bench_render_sweep.py \
  --cluster 64 --configs "96:96:128:256:s48,96:96:64:256:s48:tc3"

# 3. bench with the adopted best honest config
run bench2 1800 python bench.py

# 4. parity dataset (512px room, 100 train / 8 test, 8 spp GT)
if [ ! -d /tmp/parity_dataset ]; then
  run make_dataset 5400 python tools/make_room_dataset.py \
    --out /tmp/parity_dataset --size 512 --n_train 100 --n_test 4 --spp 8
fi

# 5. parity re-run on fixed kernels: r3 config, dense eval cadence, 3000
# iters (r3 measured ~2.65 s/iter -> ~2.5 h); resumable via --resume
run parity_r4 14400 env NO_WORKERS=1 python train.py --resume \
  -s /tmp/parity_dataset -m /tmp/parity_r4 -r 256 \
  --iterations 3000 --no_bounces_until_iter 750 \
  --test_iterations 1 250 500 750 1000 1250 1500 2000 2500 3000 \
  --save_iterations 750 3000 \
  --ray_tile 65536 --backend pallas
mkdir -p artifacts/parity_r4
cp /tmp/parity_r4/*_validation_scores.csv /tmp/parity_r4/cfg.json \
   /tmp/parity_r4/num_gaussians.txt /tmp/parity_r4/time.txt \
   artifacts/parity_r4/ 2>/dev/null

echo STAGE2_DONE | tee -a "$OUT/backlog.log"
