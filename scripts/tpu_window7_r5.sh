#!/bin/bash
# Round-5 hardware window 7 (manual, time-boxed): the trimmed tcut sweep.
# Three configs only - the current committed best (reference row) plus two
# more aggressive secondary throughput cutoffs at the FULL candidate budget
# (window 3 measured tcut=0.003 only with a smaller, starving budget).
# bench_scan_mode's adoption hook updates artifacts/bench_best.json only if
# a config passes starved<1%-per-pass AND psnr>=27 dB and beats the
# committed frame rate.
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

run tcut_sweep 2700 python tools/bench_scan_mode.py --iters 5 --configs \
scanq:128:16:128:768:tcut=0.001:ns=1:ap=bf16,\
scanq:128:16:128:768:tcut=0.005:ns=1:ap=bf16,\
scanq:128:16:128:768:tcut=0.01:ns=1:ap=bf16

echo WINDOW7_R5_DONE | tee -a "$OUT/backlog.log"
