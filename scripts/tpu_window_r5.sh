#!/bin/bash
# Round-5 interactive hardware window (between stage1 sweeps and stage2
# parity): v7 section attribution, product-space + knob A/Bs at the honest
# configs, hardware equality for the reworked scan kernels, and the
# denoiser retrain with best-val checkpointing.
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

# 1. hardware equality of the product-space scan kernels + ap=high
run hw_eq_r5 3600 python tools/hw_equality.py \
  --out "$OUT/hw_eq_tpu_r5.npz" --compare "$OUT/hw_eq_cpu_r5.npz"

# 2. v7 section attribution (roofline input) at the honest config
run v7_attr 3600 python tools/bench_v7_attr.py --iters 8

# 3. knob A/B at the honest configs: product-space (implicit - code at
# HEAD), stats-off, 3-pass attribute dot; coarse + fine clusters
run knob_ab 5400 python tools/bench_scan_mode.py --iters 5 --configs \
"scanq:128:16:128:768:tcut=0.001,\
scanq:128:16:128:768:tcut=0.001:ns=1,\
scanq:128:16:128:768:tcut=0.001:ns=1:ap=high,\
scanq:64:16:128:768:tcut=0.001:ns=1:ap=high,\
scanq:32:16:128:768:tcut=0.001:ns=1:ap=high"

# 4. denoiser retrain (best-val checkpoint) + eval refresh
run denoise_retrain 2400 python tools/denoise_train.py --train \
  --data /tmp/denoise_data.npz \
  --weights editable_gaussian_reflections_tpu/assets/denoise_kpn_v1.npz
run denoise_eval2 5400 python tools/denoiser_eval.py \
  --out "$OUT/denoiser_eval_kpn2.json"
cp "$OUT/denoiser_eval_kpn2.json" denoiser_eval.json 2>/dev/null || true

echo WINDOW_R5_DONE | tee -a "$OUT/backlog.log"
