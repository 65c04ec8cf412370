#!/bin/bash
# Round-5 hardware window 3: v7 section attribution (slabbed SMEM) and the
# last config sweep around the adopted bench config (cluster 256, tighter
# secondary tiles, cutoff tuning).
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r5_backlog
mkdir -p "$OUT"

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

run v7_attr3 3600 python tools/bench_v7_attr.py --iters 8

run final_sweep 5400 python tools/bench_scan_mode.py --iters 5 --configs \
"scanq:128:16:128:768:tcut=0.001:ns=1:ap=bf16,\
scanq:256:16:64:384:tcut=0.001:ns=1:ap=bf16,\
scanq:128:16:128:768:tsec=128:tcut=0.001:ns=1:ap=bf16,\
scanq:128:16:96:640:tcut=0.003:ns=1:ap=bf16"

echo WINDOW3_R5_DONE | tee -a "$OUT/backlog.log"
