#!/bin/bash
# Round-5 hardware window 6 (opportunistic, after the window-5 parity chain):
# the one scanq lever combination the window-3 final sweep never tried -
# FULL candidate budget (mc=128:768, the starved~0 config) with a MORE
# aggressive secondary throughput cutoff.  window3 measured tcut=0.003 only
# together with a smaller budget (96:640), which starved 1.6-4.2% on the
# secondary passes; the hypothesis here is that the speed came from the
# cutoff (rays killed when their throughput cannot matter) and the
# starvation from the budget, so full-budget + tcut should pass the <1%
# honesty gate while keeping most of the +16%.  kbuffer first so
# psnr_vs_kbuffer is measured against the exact composite.
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

run tcut_sweep 5400 python tools/bench_scan_mode.py --iters 5 --configs \
kbuffer:128:16:128:768,\
scanq:128:16:128:768:tcut=0.003:ns=1:ap=bf16,\
scanq:128:16:128:768:tcut=0.005:ns=1:ap=bf16,\
scanq:128:16:128:768:tcut=0.01:ns=1:ap=bf16,\
scanq:128:16:112:704:tcut=0.003:ns=1:ap=bf16

# re-commit the bench at whatever bench_best.json now holds
run bench_after_tcut 2400 python bench.py

echo WINDOW6_R5_DONE | tee -a "$OUT/backlog.log"
