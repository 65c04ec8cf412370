#!/bin/bash
# Round-5 TPU queue, part 2 (after the interactive kernel-bench window):
# the full parity protocol (VERDICT r4 #5), reference eval, viewer trace,
# and the final committed bench at the adopted best-honest config.
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r5_backlog
mkdir -p "$OUT"

run() {  # run NAME TIMEOUT CMD... - never abort the chain on one failure
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

# 4. parity_r5: full 8000-iter reference schedule, both r4 root-cause fixes
# (--min_weight 0.011 prune threshold, injection-time candidate-budget
# resize), 8 test views, 8-spp targets.
if [ ! -d /tmp/parity_dataset8 ]; then
  run make_dataset8 7200 python tools/make_room_dataset.py \
    --out /tmp/parity_dataset8 --size 512 --n_train 100 --n_test 8 --spp 8
fi
run parity_r5 21600 env NO_WORKERS=1 python train.py \
  -s /tmp/parity_dataset8 -m /tmp/parity_r5 -r 256 --iterations 8000 \
  --no_bounces_until_iter 750 --min_weight 0.011 \
  --test_iterations 1 250 500 750 1000 1250 1500 2000 2500 3000 4000 5000 6000 7000 8000 \
  --save_iterations 1 750 3000 8000 --ray_tile 65536 --backend pallas
mkdir -p artifacts/parity_r5
cp /tmp/parity_r5/*.csv /tmp/parity_r5/cfg.json /tmp/parity_r5/time.txt \
   /tmp/parity_r5/num_gaussians.txt artifacts/parity_r5/ 2>/dev/null || true

# 5. reference eval protocol
run parity_render 10800 python render.py -m /tmp/parity_r5 --spp 128 --skip_video
run parity_metrics 3600 python metrics.py -m /tmp/parity_r5 \
  --metrics psnr ssim lpips --render_passes diffuse specular render
run parity_fps 2400 python measure_fps.py -m /tmp/parity_r5
run parity_eval_sweep 7200 python tools/eval_sweep.py -m /tmp/parity_r5
cp /tmp/parity_r5/metrics.json /tmp/parity_r5/fps.json \
   /tmp/parity_r5/eval_sweep*.json artifacts/parity_r5/ 2>/dev/null || true

# 6. viewer FPS drag trace @512px (service in background, scan drag path)
( timeout 1800 python -m editable_gaussian_reflections_tpu.viewer.service \
    -m /tmp/parity_r5 -r 512 >"$OUT/service.log" 2>&1 & echo $! > /tmp/svc.pid )
sleep 420  # compile
run viewer_fps 900 python tools/viewer_client.py --frames 30 \
  --preview_scale 2 --fps_json "$OUT/viewer_fps_512.json" --out /tmp/viewer_frames
kill "$(cat /tmp/svc.pid)" 2>/dev/null

# 7. the committed bench, at whatever artifacts/bench_best.json now holds
run bench_final 2400 python bench.py

echo STAGE2_R5_DONE | tee -a "$OUT/backlog.log"
