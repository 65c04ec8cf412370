#!/bin/bash
# Round-5 hardware window 8 (fresh VM after the window-5/6/7 session was
# lost to a reboot): re-sized to a ~90-min budget, single chip.
#   0. smoke train (30 iters, injection at 10) - first hardware execution
#      of the post-468038e train/render path (eval budget match).
#   1. the window-6 tcut hypothesis, trimmed: full candidate budget with
#      aggressive secondary throughput cutoffs, kbuffer row first so the
#      psnr gate measures against the exact composite.
#   2. bench.py at whatever bench_best.json then holds (validates the
#      adopted config end-to-end before the driver's own run).
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r5_backlog3
mkdir -p "$OUT"

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

if [ ! -d /tmp/smoke_ds ]; then
  run smoke_ds 1200 python tools/make_room_dataset.py \
    --out /tmp/smoke_ds --size 128 --n_train 4 --n_test 2 --spp 2
fi
rm -rf /tmp/smoke_model
run smoke_train 1500 env NO_WORKERS=1 python train.py \
  -s /tmp/smoke_ds -m /tmp/smoke_model -r 128 --iterations 30 \
  --no_bounces_until_iter 10 --test_iterations 1 10 20 30 \
  --save_iterations 30 --ray_tile 16384 --backend pallas
echo SMOKE_DONE | tee -a "$OUT/backlog.log"

run tcut_sweep 3000 python tools/bench_scan_mode.py --iters 4 --configs \
kbuffer:128:16:128:768,\
scanq:128:16:128:768:tcut=0.003:ns=1:ap=bf16,\
scanq:128:16:128:768:tcut=0.01:ns=1:ap=bf16,\
scanq:128:16:112:704:tcut=0.003:ns=1:ap=bf16

run bench_final 1500 python bench.py

echo WINDOW8_R5_DONE | tee -a "$OUT/backlog.log"
