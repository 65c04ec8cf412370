#!/bin/bash
# Round-5 hardware window 10: the window-9 parity probe, trimmed to the
# recovered end-of-round session.  Window 8 already landed the tcut sweep
# and a bench.py validation run, so this chain is only the VERDICT r4 #5
# evidence: a 3000-iter probe with the two r5 fixes live (candidate-budget
# resize at far-field injection + --min_weight 0.011), then render/metrics/
# fps on the final checkpoint so parity_r5_probe carries a full record.
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r5_backlog3
PROBE=artifacts/parity_r5_probe
mkdir -p "$OUT" "$PROBE"

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

snap() {
  cp /tmp/probe_model/*.csv /tmp/probe_model/cfg.json /tmp/probe_model/time.txt \
     /tmp/probe_model/num_gaussians.txt "$PROBE/" 2>/dev/null || true
}

if [ ! -d /tmp/probe_ds ] || [ ! -f /tmp/probe_ds/transforms_train.json ]; then
  rm -rf /tmp/probe_ds
  run probe_ds 1800 python tools/make_room_dataset.py \
    --out /tmp/probe_ds --size 256 --n_train 100 --n_test 4 --spp 4
fi

# background snap loop (dies with the script)
( while true; do sleep 120; snap; done ) & SNAP_PID=$!
trap 'kill $SNAP_PID 2>/dev/null' EXIT

run probe_train 3400 env NO_WORKERS=1 python train.py --resume \
  -s /tmp/probe_ds -m /tmp/probe_model -r 256 --iterations 3000 \
  --no_bounces_until_iter 750 --min_weight 0.011 \
  --test_iterations 1 250 500 750 1000 1250 1500 1750 2000 2250 2500 2750 3000 \
  --save_iterations 750 1500 2250 3000 \
  --ray_tile 65536 --backend pallas
snap
echo PROBE_TRAIN_DONE | tee -a "$OUT/backlog.log"

# full parity protocol on whatever checkpoint landed: 128-spp renders on the
# 4 test views, metrics.json, fps.json (scanq inference default)
run probe_render 1500 python render.py -m /tmp/probe_model --split test --spp 128
run probe_metrics 900 python metrics.py -m /tmp/probe_model \
  --metrics psnr ssim lpips --render_passes diffuse specular render
run probe_fps 900 python measure_fps.py -m /tmp/probe_model
cp /tmp/probe_model/fps.json /tmp/probe_model/metrics.json "$PROBE/" 2>/dev/null || true
snap

echo WINDOW10_R5_DONE | tee -a "$OUT/backlog.log"
