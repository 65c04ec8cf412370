#!/bin/bash
# Round-5 hardware window 5: the parity_r5 chain, re-sized to the actual
# session budget (~4h wall-clock, single CPU host).  Differences vs
# tpu_window4_r5.sh: train timeout 8400s (leaves ~45 min for the eval
# protocol), hedge saves every 1000 iters from 3000, CSV snapshots after
# every step, eval steps individually time-boxed so a slow one cannot
# starve the rest, and the viewer drag trace runs BEFORE eval_sweep (the
# VERDICT item) instead of after.
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r5_backlog3
mkdir -p "$OUT" artifacts/parity_r5

run() {  # run NAME TIMEOUT CMD... - never abort the chain on one failure
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

snap() {  # copy the live training record into the repo
  cp /tmp/parity_r5/*.csv /tmp/parity_r5/cfg.json /tmp/parity_r5/time.txt \
     /tmp/parity_r5/num_gaussians.txt artifacts/parity_r5/ 2>/dev/null || true
}

# 0. smoke: tiny dataset + 30 iters with far-field injection at 10
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

# 1. the full parity dataset (8 test views, 8-spp targets) - ~29 min
if [ ! -d /tmp/parity_dataset8 ]; then
  run make_dataset8 3600 python tools/make_room_dataset.py \
    --out /tmp/parity_dataset8 --size 512 --n_train 100 --n_test 8 --spp 8
fi

# 2. parity_r5: full 8000-iter reference schedule, both r4 root-cause fixes.
#    timeout sized so a straggler still leaves the eval window; hedge saves
#    every 1000 iters mean search_for_max_iteration always finds the latest.
run parity_r5 8400 env NO_WORKERS=1 python train.py --resume \
  -s /tmp/parity_dataset8 -m /tmp/parity_r5 -r 256 --iterations 8000 \
  --no_bounces_until_iter 750 --min_weight 0.011 \
  --test_iterations 1 250 500 750 1000 1250 1500 2000 2500 3000 4000 5000 6000 7000 8000 \
  --save_iterations 1 750 3000 4000 5000 6000 7000 8000 \
  --ray_tile 65536 --backend pallas
snap

# 3. reference eval protocol (test split, 128 spp)
run parity_render 1800 python render.py -m /tmp/parity_r5 --spp 128 --skip_video
run parity_metrics 900 python metrics.py -m /tmp/parity_r5 \
  --metrics psnr ssim lpips --render_passes diffuse specular render
run parity_fps 1500 python measure_fps.py -m /tmp/parity_r5
cp /tmp/parity_r5/metrics.json /tmp/parity_r5/fps.json \
   artifacts/parity_r5/ 2>/dev/null || true
snap

# 4. viewer FPS drag trace @512px (service in background, scan drag path)
( timeout 1500 python -m editable_gaussian_reflections_tpu.viewer.service \
    -m /tmp/parity_r5 -r 512 >"$OUT/service.log" 2>&1 & echo $! > /tmp/svc.pid )
sleep 420  # compile
run viewer_fps 900 python tools/viewer_client.py --frames 30 \
  --preview_scale 2 --fps_json "$OUT/viewer_fps_512.json" --out /tmp/viewer_frames
kill "$(cat /tmp/svc.pid)" 2>/dev/null
cp "$OUT/viewer_fps_512.json" artifacts/parity_r5/ 2>/dev/null || true

# 5. eval sweep (per-spp denoiser table on the parity checkpoint)
run parity_eval_sweep 1500 python tools/eval_sweep.py -m /tmp/parity_r5
cp /tmp/parity_r5/eval_sweep*.json artifacts/parity_r5/ 2>/dev/null || true
snap

# 6. the committed bench, at whatever artifacts/bench_best.json now holds
run bench_final 2400 python bench.py

echo WINDOW5_R5_DONE | tee -a "$OUT/backlog.log"
