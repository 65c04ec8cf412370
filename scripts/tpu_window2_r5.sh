#!/bin/bash
# Round-5 hardware window, part 2 (after the ap=high Mosaic finding and
# the center-depth-precision fix): re-run attribution + equality + the
# corrected bf16 attr-dot A/B.
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

# v7 section attribution (roofline input), now without the HIGH crash
run v7_attr2 3600 python tools/bench_v7_attr.py --iters 8

# corrected knob A/B: single-pass bf16 attribute dot
run knob_ab2 5400 python tools/bench_scan_mode.py --iters 5 --configs \
"scanq:128:16:128:768:tcut=0.001:ns=1,\
scanq:128:16:128:768:tcut=0.001:ns=1:ap=bf16,\
scan:128:16:128:768:tcut=0.001:ns=1"

# hardware equality with the backend-deterministic center-depth keys
run hw_eq_r5b 3600 python tools/hw_equality.py \
  --out "$OUT/hw_eq_tpu_r5b.npz" --compare "$OUT/hw_eq_cpu_r5.npz"

echo WINDOW2_R5_DONE | tee -a "$OUT/backlog.log"
